package graft

/** Mirrors the driver's t1 smoke: run `SparkEntry.entry` and assert rows>0,
  * plus the Layer B session surface (ping/probe/DDL/verification query).
  */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(defaultCpus = 8)
    val df = SparkEntry.entry(spark)
    val n = df.count()
    df.show(25, truncate = false)
    println(s"ENTRY_ROWS=$n")
    require(n > 0, "entry returned no rows")

    // Layer B surface (SURVEY B1-B7).
    require(queries.FlowQueries.ping(spark), "ping failed")
    val flows = pipeline.FlowPipeline.batch(
      spark.read.text(queries.PipelineQueries.fixturePath))
    queries.FlowQueries.setupTable(spark, flows)
    println(s"PROBE_ROWS=${queries.FlowQueries.probe(spark).count()}")
    val ver = queries.FlowQueries.verification(spark)
    ver.show(10, truncate = false)
    val nv = ver.count()
    println(s"VERIFICATION_ROWS=$nv")
    require(nv > 0, "verification query returned no rows")
    spark.stop()
  }
}
