package graft

/** Dev tool for bench adjudication (DESIGN.md discipline: isolate before
  * believing a suite median): time the named declared queries cold and warm
  * on `SPARK_GRAFT_SF_DIR` (default sf0.1), one JVM, nothing else running.
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.Timeit q55_quantile_bins"
  */
object Timeit {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "pass one or more SparkEntry.queries names")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(defaultCpus = 32)
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { n =>
      Seq("cold", "warm").foreach { tag =>
        // Bench's inter-query GC hygiene (r15: multi-query Timeit sessions
        // at decade scale read warm SLOWER than cold from accumulated
        // heap/shuffle pressure — SCALE_r15 §3; the readings must be
        // per-plan cost, not prior queries' garbage)
        System.gc()
        val t0 = System.nanoTime()
        val rows = SparkEntry.queries(n)(spark, dir).collect().length
        println(f"$n%s($tag%s) rows=$rows%d sec=${(System.nanoTime() - t0) / 1e9}%.3f")
      }
    }
    spark.stop()
  }
}
