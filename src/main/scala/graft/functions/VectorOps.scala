package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level vector math over `ArrayType(FloatType)` embedding columns.
  *
  * Built from Catalyst higher-order functions (`zip_with`, `aggregate`) rather
  * than Scala UDFs so the expressions stay inside Catalyst (prunable,
  * null-safe, no serialization of closures per row). All math is done in
  * Double regardless of the array element type, and the fold is
  * left-to-right in element order, which makes results deterministic and
  * reproducible against a sequential oracle.
  */
object VectorOps {

  /** Elementwise product folded to a Double sum: `sum_i a[i]*b[i]`. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)

  /** L2 norm, in Double. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity in Double; null-safe via the underlying expressions
    * (null array => null result).
    */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Squared euclidean distance. */
  def l2sq(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => {
        val d = x.cast("double") - y.cast("double"); d * d
      }),
      lit(0.0),
      (acc, v) => acc + v)
}
