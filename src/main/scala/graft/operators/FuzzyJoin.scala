package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Record linkage (fuzzy entity resolution): find, for each record, its best
  * approximate match among records sharing a BLOCKING key — never comparing
  * across blocks, so the all-pairs explosion that makes naive fuzzy joins
  * quadratic is structurally impossible.
  *
  * The same three-tier discipline as the MinHash pipeline
  * ([[Dedup]], SURVEY C14), applied to relational entities instead of
  * documents:
  *   1. BLOCK on cheap equality keys (shuffle-friendly equi-join);
  *   2. CAP per-block occupancy — saturated blocks (a degenerate key, e.g.
  *      a null-heavy column) are dropped deterministically rather than
  *      allowed to go quadratic;
  *   3. VERIFY candidates with the expensive distance, keep the best match
  *      per record (ties broken by candidate id — total order, oracle-safe).
  *
  * Scale shape: one shuffle on the blocking key for the self-join, one on
  * the record id for the best-match window; per-block work is ≤ cap², so
  * worst-case cost is (#blocks)·cap² regardless of corpus size.
  */
object FuzzyJoin {

  /** Best fuzzy match per record.
    *
    * @param records   input frame
    * @param idCol     unique record id (output key)
    * @param blockCols equality blocking keys
    * @param distance  (left payload, right payload) => integer distance
    * @param payload   column compared by `distance`
    * @param maxDist   keep candidates with distance ≤ maxDist
    * @param cap       drop blocks with more than `cap` records
    * @return (idCol, match_key, dist) — one row per record with ≥1 candidate
    */
  def bestMatch(records: DataFrame, idCol: String, blockCols: Seq[String],
                payload: String, distance: (Column, Column) => Column,
                maxDist: Int, cap: Int): DataFrame = {
    require(blockCols.nonEmpty, "at least one blocking column")
    require(cap >= 2, s"cap must allow pairs, got $cap")
    // Internal working columns are injected with withColumn on the caller's
    // frame; a caller column with one of these names would be silently
    // shadowed mid-pipeline (ADVICE r7) — reject it up front instead.
    val internal = Set("_bs", "_yid", "_ypay", "_d", "_rn")
    val clash = records.columns.filter(internal)
    require(clash.isEmpty,
      s"records frame uses reserved internal column name(s): ${clash.mkString(", ")}")
    val bw = Window.partitionBy(blockCols.map(col): _*)
    val b = records
      .select((idCol +: payload +: blockCols).distinct.map(col): _*)
      .withColumn("_bs", count(lit(1)).over(bw))
      .filter(col("_bs") <= cap)
      .drop("_bs")
    // The explicit ID-keyed repartition (r17, guide §2.5) pins the verify
    // stage's width: the block-count window's exchange is AQE-coalesced to
    // ~one partition at bench scale (blocks are tiny in BYTES), which ran
    // the O(Σ block²) distance verification on a single core — measured
    // as 7 single-task stages on link_parts. The pin must use a key the
    // plan does not already hash by (a same-key repartition is ELIDED into
    // the coalescible exchange above it); the record id is that key, and
    // it is exactly what the best-match window below partitions by, so the
    // pinned exchange is REUSED there rather than added. Only the probe
    // side is pinned — the candidate side stays narrow and broadcasts.
    val x = b
      .repartition(records.sparkSession.sparkContext.defaultParallelism, col(idCol))
      .as("x")
    val y = b.select(
      (col(idCol).as("_yid") +: col(payload).as("_ypay") +:
        blockCols.map(col)): _*).as("y")
    val blockEq = blockCols.map(c => x(c) === y(c)).reduce(_ && _)
    val dist = distance(x(payload), col("_ypay"))
    x.join(y, blockEq && x(idCol) =!= col("_yid"))
      .withColumn("_d", dist)
      .filter(col("_d") <= maxDist)
      .withColumn("_rn", row_number().over(Window.partitionBy(x(idCol))
        .orderBy(col("_d").asc, col("_yid").asc)))
      .filter(col("_rn") === 1)
      .select(x(idCol), col("_yid").as("match_key"), col("_d").as("dist"))
  }
}
