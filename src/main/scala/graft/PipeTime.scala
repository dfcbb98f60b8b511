package graft

/** Dev tool: isolate the streaming-pipeline throughput reading that Bench
  * reports as `pipeline_rows_per_sec` (same generator, same sink), repeated
  * so JIT/warm-up effects are visible.
  *
  *   sbt "runMain graft.PipeTime 3"
  */
object PipeTime {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(3)
    val spark = GraftSession.local(defaultCpus = 32)
    spark.sparkContext.setLogLevel("ERROR")
    (1 to reps).foreach { i =>
      val r = Bench.pipelineThroughput(spark, 500000L)
      println(f"pipeline run $i: $r%.0f rows/s")
    }
    spark.stop()
  }
}
