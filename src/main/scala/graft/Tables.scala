package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-generated testdata tables (TESTDATA.md / FIXTURES.md §2).
  *
  * One parquet file per table under `\$dir/\$name.parquet`. Reads are plain
  * `spark.read.parquet` so Catalyst column pruning and predicate pushdown reach
  * the scan (verify via `.explain`: `PushedFilters`, `ReadSchema`).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Register every testdata table as a temp view so users can `spark.sql`
    * over the corpus directly (the engine's SQL entry point).
    */
  def registerAll(s: SparkSession, d: String): Unit =
    names.foreach { n =>
      val df = if (n == "events") events(s, d) else apply(s, d, n)
      df.createOrReplaceTempView(n)
    }

  def region(s: SparkSession, d: String): DataFrame     = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = apply(s, d, "lineitem")
  /** `events.ts` normalized to TimestampType with the SAME epoch instant in
    * ANY session zone: the file's naive wall-clock is anchored as UTC (what
    * the generator means, and what DuckDB's naive read + the driver's UTC
    * canonicalization compare against). Generator versions have produced two
    * shapes so far:
    *
    *  - TIMESTAMP(NANOS): reads as raw long under
    *    `spark.sql.legacy.parquet.nanosAsLong=true` (no sub-microsecond
    *    components, so `div 1000` is lossless); `timestamp_micros` is
    *    epoch-based, hence instant-preserving regardless of zone.
    *  - naive TIMESTAMP(MICROS): reads as TIMESTAMP_NTZ under stock Spark
    *    (`inferTimestampNTZ` defaults on). A bare NTZ→LTZ cast would be
    *    wall-clock-preserving in the SESSION zone, which only equals the
    *    anchored instant when that zone is UTC — and any conversion that
    *    routes through a DST zone's wall-clock is ambiguous for the
    *    repeated hour of each fall-back transition. So the naive value is
    *    turned into epoch micros by pure FIELD EXTRACTION — `unix_date`,
    *    `hour`, `minute`, `extract(SECOND)` read the wall-clock components
    *    straight off the NTZ value and recombine them arithmetically; no
    *    zone is consulted anywhere. `timestampdiff` was considered and
    *    REJECTED: it routes its NTZ operands through the session zone, which
    *    corrupts times inside DST gaps/overlaps (spec-pinned). Then
    *    `timestamp_micros` builds the instant. Both shapes therefore agree
    *    in every session zone, including across DST transitions.
    *
    * Caveat (documented semantics, not a bug): a foreign session that
    * explicitly disables `inferTimestampNTZ` reads the naive file directly as
    * session-zone TimestampType before this loader sees it; that shape is
    * indistinguishable from a genuinely UTC-adjusted file, so it is passed
    * through (wall-clock semantics in that session's zone). Graft-built
    * sessions never take that path.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = apply(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType         => raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType =>
        // field extraction only: date/hour/minute/second read the naive
        // wall-clock directly from the NTZ value (no implicit NTZ→LTZ cast
        // anywhere — timestampdiff and friends route through the session
        // zone and corrupt DST-gap/overlap times, spec-pinned)
        raw.withColumn("ts", expr(
          """timestamp_micros(
            |  unix_date(cast(ts AS DATE)) * 86400000000L +
            |  hour(ts) * 3600000000L + minute(ts) * 60000000L +
            |  cast(extract(SECOND FROM ts) * 1000000 AS BIGINT))""".stripMargin))
      case _                => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")

  /** Spread a SCAN-STARVED input across the session's cores (r16, guide
    * §2.5 "one huge unsplittable file"): the driver testdata ships each
    * table as ONE parquet file with ONE row group, so every scan stage —
    * decode, the per-row expressions fused into it, and the partial
    * aggregation before the first exchange — runs on a single core no
    * matter how many the session has. For queries whose per-row work is
    * material (decimal moment casts, shingling, tokenization, regex), a
    * round-robin repartition right after the scan is the guide's remedy:
    * the exchange moves narrow rows once and the heavy expressions run on
    * every core.
    *
    * Scale-adaptive, not local-tuned: the repartition fires only when the
    * input's file count is below half the session's parallelism — a real
    * multi-file corpus (any production table, any 100 TB layout) already
    * scans wide and passes through untouched. Callers must be
    * order-independent (every declared query here is — exact/integer
    * aggregates plus a total ORDER BY) and must NOT be staging writers
    * (bucketed staging controls its own file layout).
    */
  def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.inputFiles.length >= math.max(1, target / 2)) df
    else df.repartition(target)
  }
}
