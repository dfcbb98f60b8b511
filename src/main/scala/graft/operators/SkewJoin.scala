package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Manual skew mitigation for shuffle joins: salt the skewed (left) side's
  * key into `saltFactor` sub-keys and replicate the right side across every
  * salt value, turning one hot shuffle partition into `saltFactor` even ones.
  *
  * AQE's skew-join splitting (enabled in `GraftSession`) handles most cases
  * at runtime; explicit salting remains the structural fix when a single key
  * dominates so heavily that even split partitions bottleneck, or when the
  * join is feeding a window/aggregation that AQE can't re-split.
  */
object SkewJoin {

  /** Inner equi-join `left(keyL) = right(keyR)` with the left side salted.
    * Deterministic salt from a stable hash of the whole left row would not
    * distribute replicated keys, so the salt is `monotonically_increasing_id
    * % saltFactor` — even by construction, and correctness doesn't depend on
    * which salt a row gets.
    *
    * The replicated side carries a `merge` hint: salting only changes
    * anything for a SHUFFLE join (it splits the hot key's shuffle partition
    * `saltFactor` ways), and a right side small enough for Spark to
    * auto-broadcast wouldn't need salting in the first place — the hint keeps
    * the demonstrated plan the one the operator exists for.
    */
  def saltedInnerJoin(left: DataFrame, right: DataFrame,
                      keyL: Column, keyR: Column, saltFactor: Int = 8): DataFrame = {
    val salted = left.withColumn("_salt", (monotonically_increasing_id() % saltFactor).cast("int"))
    val replicated = right.withColumn("_salt",
      explode(array((0 until saltFactor).map(lit): _*)))
    salted.join(replicated.hint("merge"), keyL === keyR && salted("_salt") === replicated("_salt"))
      .drop("_salt")
  }
}
