package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Training-mixture construction operators: deterministic per-source
  * sampling and token-budget shard packing.
  */
object Sampling {

  /** 2^60 — the sampling hash space (60 bits keeps the threshold compare in
    * signed-long range, same convention as the dedup hashes).
    */
  val hashSpace: Double = (1L << 60).toDouble

  /** Deterministic mixture sampling: keep a doc iff its salted 60-bit md5
    * falls below `rate(source) × 2^60`. Properties that matter for training
    * dumps at scale:
    *  - stateless filter — no shuffle, no RNG seed plumbing, fully parallel;
    *  - reproducible — the same doc set survives on every run and engine;
    *  - stable under rate changes — raising a source's rate only ADDS docs
    *    (hashes don't move), so incremental dumps stay supersets.
    * The rate table rides a broadcast left join; unlisted sources fall back
    * to `defaultRate`.
    */
  def mixSample(docs: DataFrame, rates: Map[String, Double], defaultRate: Double = 0.0,
                idCol: String = "doc_id", sourceCol: String = "source"): DataFrame = {
    val ratesDf = docs.sparkSession
      .createDataFrame(rates.toSeq.sorted).toDF(sourceCol, "rate")
    docs.join(broadcast(ratesDf), Seq(sourceCol), "left")
      .withColumn("u",
        conv(substring(md5(concat(col(idCol).cast("string"), lit("#mix"))), 1, 15), 16, 10)
          .cast("long"))
      .filter(col("u") < (coalesce(col("rate"), lit(defaultRate)) * hashSpace).cast("long"))
      .drop("u", "rate")
  }

  /** Token-budget shard packing: within each source (ordered by id), docs
    * accumulate into shards of ~`tokensPerShard` via a running token sum —
    * shard = previous cumulative tokens div budget. One window per source;
    * at 100 TB the per-source sort is the bucketed-table sort order, not a
    * global sort. Integral `div` keeps both engines exact.
    */
  def packShards(docs: DataFrame, tokensPerShard: Long,
                 idCol: String = "doc_id", sourceCol: String = "source",
                 textCol: String = "text"): DataFrame = {
    val w = Window.partitionBy(sourceCol).orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs.withColumn("toks", TextFunctions.tokenCount(col(textCol)))
      .withColumn("cum", sum("toks").over(w))
      .select(col(idCol), col(sourceCol), col("toks"),
        expr(s"(cum - toks) div $tokensPerShard").as("shard"))
  }
}
