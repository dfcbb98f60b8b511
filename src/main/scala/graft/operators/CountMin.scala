package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Count-Min sketch as a relational, mergeable aggregate — the
  * point-frequency member of the fixed-size-state sketch family (HLL C3
  * answers distinct-count, Misra-Gries C42 answers top-k membership; CMS
  * answers "how often does THIS key occur" for any key, with a one-sided
  * overestimate bound ε·N at δ confidence from d×w counters).
  *
  * Scale shape: building is one scan exploded ×d into a partial-aggregable
  * (row, bucket) count — the shuffle carries at most d·w counter rows
  * whatever the corpus (256 longs at the default 4×64), and counters MERGE
  * by addition across shards/streams like every sketch here. Estimation
  * joins a bounded probe set against the counter table (d rows per probe).
  *
  * Determinism contract: the d row-hashes are the Kirsch-Mitzenmacher
  * combinations over the two md5 halves — literally [[Dedup]]'s minhash
  * hash basis (`h_i = (h1 + i·h2) & mask`), so the DuckDB oracle mirrors
  * them with the same hex-substring arithmetic and every counter and every
  * min-estimate is integer-exact in both engines.
  */
object CountMin {

  /** (h1, h2) hash basis columns for a token column — one md5 per value,
    * the [[Dedup.minhashSignatures]] carving.
    */
  private def hashBasis(df: DataFrame, tokenCol: String): DataFrame =
    df.select(col(tokenCol),
      conv(substring(md5(col(tokenCol)), 1, 15), 16, 10).cast("long").as("h1"),
      shiftright(conv(substring(md5(col(tokenCol)), 17, 15), 16, 10)
        .cast("long"), 4).as("h2"))

  private def bucketCols(d: Int, w: Int) = (0 until d).map(i =>
    ((col("h1") + col("h2") * i).bitwiseAND(Dedup.km_mask) % w).cast("int"))

  /** The d×w counter table over one occurrence per input row:
    * (row_i, bucket, c).
    */
  def counters(toks: DataFrame, tokenCol: String, d: Int, w: Int): DataFrame =
    hashBasis(toks, tokenCol)
      .select(posexplode(array(bucketCols(d, w): _*)).as(Seq("row_i", "bucket")))
      .groupBy("row_i", "bucket")
      .agg(count(lit(1)).as("c"))

  /** Point estimates for a bounded probe frame: min over the d counters
    * each probe hashes into — (tokenCol, est). Inner join is exact: every
    * probe's buckets exist (the probe itself was counted).
    */
  def estimate(ctr: DataFrame, probes: DataFrame, tokenCol: String,
               d: Int, w: Int): DataFrame =
    hashBasis(probes, tokenCol)
      .select(col(tokenCol),
        posexplode(array(bucketCols(d, w): _*)).as(Seq("row_i", "bucket")))
      .join(ctr, Seq("row_i", "bucket"))
      .groupBy(tokenCol)
      .agg(min("c").as("est"))
}
