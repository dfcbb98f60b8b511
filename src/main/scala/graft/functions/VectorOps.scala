package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

import graft.expressions.FloatDotProduct

/** Column-level vector math over `ArrayType(FloatType)` embedding columns.
  *
  * The dot product is a native codegen'd Catalyst expression
  * ([[FloatDotProduct]]); everything else composes from it. All math is done
  * in Double with a left-to-right element fold, which makes results
  * deterministic and bit-identical to a sequential oracle (and to the
  * higher-order-function formulation it replaced).
  */
object VectorOps {

  /** Elementwise product summed in Double: `sum_i a[i]*b[i]`. */
  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(
      FloatDotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** HOF formulation kept for differential testing against the native one. */
  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)

  /** L2 norm, in Double. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity in Double; null-safe via the underlying expressions
    * (null array => null result). A zero vector gets similarity 0.0 — the
    * same guard the oracle SQL carries, since the bare division would yield
    * NULL in Spark but NaN/inf in DuckDB.
    */
  def cosine(a: Column, b: Column): Column =
    when(norm(a) === 0 || norm(b) === 0, lit(0.0))
      .otherwise(dot(a, b) / (norm(a) * norm(b)))

  /** Squared euclidean distance. */
  def l2sq(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => {
        val d = x.cast("double") - y.cast("double"); d * d
      }),
      lit(0.0),
      (acc, v) => acc + v)
}
