package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table helpers: pre-shuffle a big table ONCE by its join key so
  * every later join/aggregation on that key runs shuffle-free — the batch
  * analogue of co-partitioned state, and the structural fix when the same
  * 100 TB fact table is joined on the same key by many queries.
  *
  * Spark persists bucket metadata in the catalog, so the tables must be
  * written with `saveAsTable` (path-based parquet loses bucketing info).
  */
object Bucketing {

  /** Write `df` as a bucketed, in-bucket-sorted catalog table. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode("overwrite")
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)

  def read(spark: SparkSession, table: String): DataFrame = spark.table(table)
}
