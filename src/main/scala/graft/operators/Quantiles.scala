package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact interpolated quantiles by DISTRIBUTED SELECTION — the scale answer
  * when the built-in `percentile` aggregate degenerates: that aggregate
  * materializes a value→count map per partial buffer, so a mostly-distinct
  * double column (prices, scores) costs partitions × distinct-values map
  * entries merged onto one reducer (measured: ~7 s for 600 k doubles at
  * sf0.1, and growing linearly with the corpus). Selection instead:
  *
  *  1. range-partition the column (one shuffle of the single column);
  *  2. count rows per partition (a parts-row collect) → global offsets;
  *  3. sort WITHIN each partition only (`row_number` per partition id —
  *     range partitioning makes local order global) and keep the ≤ 2·|qs|
  *     rows whose global rank is a quantile's floor/ceil neighbor — a
  *     broadcast semi-join against a parts-bounded rank list;
  *  4. interpolate on the driver: `lo·(1−frac) + hi·frac` at rank
  *     `q·(n−1)` — bit-identical to Spark's `percentile` aggregate
  *     (spec-pinned); DuckDB's `quantile_cont` uses the algebraically
  *     equal `lo + (hi−lo)·frac`, within 1 ulp — invisible behind the
  *     6-dp oracle rounding, and bin-boundary comparisons are unaffected
  *     because interpolated cuts fall strictly between data values.
  *
  * No global sort, no value-count map: total work is one narrow shuffle +
  * per-partition sorts, and what reaches the driver is O(parts + |qs|)
  * scalars. Ties need no care (equal values make equal order statistics).
  */
object Quantiles {

  /** Exact interpolated quantiles of `valueCol` (nulls skipped), computed
    * eagerly (three bounded jobs) — the cuts are a model artifact like
    * trained centroids, meant to be embedded as literals in the consuming
    * plan. `qs` values must lie in [0, 1].
    */
  def exactQuantiles(df: DataFrame, valueCol: String, qs: Seq[Double],
                     parts: Int = 32): Array[Double] = {
    require(qs.nonEmpty && qs.forall(q => q >= 0 && q <= 1),
      s"quantiles must be in [0,1], got $qs")
    val vals = df.select(col(valueCol).cast("double").as("v"))
      .filter(col("v").isNotNull)
      .repartitionByRange(parts, col("v"))
      .withColumn("pid", spark_partition_id())
      .localCheckpoint() // one materialization feeds both the counts and the rank pass
    val counts = vals.groupBy("pid").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val n = counts.values.sum
    if (n == 0) return Array.fill(qs.length)(Double.NaN)

    // global rank targets: floor and ceil neighbors of each q·(n−1)
    val pos = qs.map(q => q * (n - 1))
    val targets = pos.flatMap(p => Seq(math.floor(p).toLong, math.ceil(p).toLong)).distinct

    // partition offsets in pid order; map each target to (pid, local rank)
    val pids = (0 until parts).map(p => p -> counts.getOrElse(p, 0L))
    val offsets = pids.scanLeft(0L) { case (acc, (_, c)) => acc + c }
    val local = targets.map { t =>
      val pid = offsets.lastIndexWhere(_ <= t, offsets.length - 2) // index of owning partition
      (pid, t - offsets(pid), t)
    }
    val spark = df.sparkSession
    import spark.implicits._
    val want = broadcast(local.map { case (pid, rn, _) => (pid, rn) }.toDF("pid", "want"))
    val w = Window.partitionBy("pid").orderBy("v")
    // global rank recovers driver-side from (pid, local rn) + offsets
    val got = vals
      .withColumn("rn", row_number().over(w).cast("long") - 1)
      .join(want, Seq("pid"))
      .filter(col("rn") === col("want"))
      .select("pid", "rn", "v")
      .collect()
      .map(r => (offsets(r.getInt(0)) + r.getLong(1)) -> r.getDouble(2))
      .toMap

    pos.toArray.map { p =>
      val (lo, hi) = (math.floor(p).toLong, math.ceil(p).toLong)
      val (vl, vh) = (got(lo), got(hi))
      vl * (1.0 - (p - lo)) + vh * (p - lo)
    }
  }
}
