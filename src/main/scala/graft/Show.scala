package graft

/** Dev tool for the scale rehearsals: run named declared queries and print
  * their (bounded) result rows with wall time — recall/audit rows are
  * VALUES, and the decade tables in SCALE_r* record readings, not row
  * counts ([[Timeit]] prints counts only).
  *
  *   SPARK_GRAFT_SF_DIR=/tmp/graft_sf10dc sbt "runMain graft.Show sim_recall_ivf mm_recall"
  */
object Show {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "pass one or more SparkEntry.queries names")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(defaultCpus = 32)
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { n =>
      val t0 = System.nanoTime()
      val rows = SparkEntry.queries(n)(spark, dir).collect()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"== $n%s sec=$sec%.3f rows=${rows.length}%d")
      rows.take(20).foreach(r => println(s"   $r"))
    }
    spark.stop()
  }
}
