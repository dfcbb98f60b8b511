package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.expressions.{FloatDotProduct, LshCode, SimhashAgg}
import graft.operators.Similarity

/** Session extension wiring (`spark.sql.extensions=graft.GraftExtensions`):
  * exposes the engine's native expressions to the SQL surface, so
  * `spark.sql` users get the same codegen'd kernels the DataFrame API uses —
  *
  *   graft_dot(a, b)           — Double dot product of two FLOAT arrays
  *   graft_lsh_code(v[, p])    — p-plane signed-hyperplane LSH code (default
  *                               [[Similarity.lshPlanes]])
  *   graft_simhash(lo, hi)     — aggregate: 64-bit SimHash from two 32-bit
  *                               hash halves
  *
  * Registered through `injectFunction`, the standard extension point — no
  * analyzer/optimizer forks, and the functions resolve in any session built
  * with the extension (GraftSession sets it by default).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      info("graft_dot", "graft_dot(a, b) - dot product of two ARRAY<FLOAT> in DOUBLE"),
      { case Seq(a, b) => FloatDotProduct(a, b) }: Seq[Expression] => Expression))

    ext.injectFunction((
      FunctionIdentifier("graft_lsh_code"),
      info("graft_lsh_code",
        "graft_lsh_code(v[, planes]) - signed-hyperplane LSH code of ARRAY<FLOAT>"),
      { args: Seq[Expression] =>
        args match {
          case Seq(v) => LshCode(v, Similarity.lshPlanes, Similarity.dims)
          case Seq(v, Literal(p: Int, _)) => LshCode(v, p, Similarity.dims)
          case other => throw new IllegalArgumentException(
            s"graft_lsh_code expects (vector[, planes literal]), got ${other.length} args")
        }
      }))

    ext.injectFunction((
      FunctionIdentifier("graft_simhash"),
      info("graft_simhash",
        "graft_simhash(lo, hi) - aggregate 64-bit SimHash over 32-bit hash halves"),
      { case Seq(lo, hi) => SimhashAgg(lo, hi) }: Seq[Expression] => Expression))
  }
}
