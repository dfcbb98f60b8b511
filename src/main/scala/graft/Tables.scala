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
  /** `events.ts` normalized to session-zone TimestampType whatever the parquet
    * physical shape. Generator versions have produced two shapes so far:
    * TIMESTAMP(NANOS) (reads as raw long under
    * `spark.sql.legacy.parquet.nanosAsLong=true`; no sub-microsecond components,
    * so `div 1000` is lossless) and naive TIMESTAMP(MICROS) (reads as
    * TIMESTAMP_NTZ when a session leaves `inferTimestampNTZ` on — Graft
    * sessions turn it off, but users bring their own sessions). The session
    * zone is UTC, so the NTZ→LTZ cast is wall-clock identity and both shapes
    * agree with DuckDB's naive read of the same file.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = apply(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType         => raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case _                => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
