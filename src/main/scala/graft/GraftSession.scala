package graft

import org.apache.spark.sql.SparkSession

/** Single place for session config so Verify / Bench / tests / app agree.
  *
  * Scale notes: shuffle partitions match local cores here; on a real cluster
  * AQE coalesces post-shuffle partitions anyway (`adaptive.enabled` +
  * `coalescePartitions`), and skew-join splitting is on so a hot key in a
  * shuffle join is split at runtime rather than stalling one task.
  */
object GraftSession {
  def builder(master: String, shufflePartitions: Int): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .appName("graft")
      // native expressions on the SQL surface (graft_dot, graft_lsh_code, ...)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // testdata events.ts is parquet TIMESTAMP(NANOS); read as long nanos
      // (Tables.events converts back to TimestampType, losslessly).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // keep catalog tables (bucketed writes) out of the repo working dir
      .config("spark.sql.warehouse.dir",
        s"${System.getProperty("java.io.tmpdir")}/graft-warehouse")

  /** Session for the driver-invoked mains; core count from SPARK_GRAFT_CPUS. */
  def local(defaultCpus: Int = 32): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", defaultCpus.toString)
    val spark = builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
