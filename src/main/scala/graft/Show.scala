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
    // validate BEFORE the session spins up: a typo should die with near-miss
    // suggestions, not a bare key-not-found after 10 s of Spark startup
    val unknown = args.filterNot(SparkEntry.queries.keySet)
    if (unknown.nonEmpty) {
      val hints = unknown.map { u =>
        val near = SparkEntry.queries.keySet.toSeq
          .filter(k => k.contains(u.take(6)) || u.contains(k.take(6))).sorted.take(5)
        s"'$u'" + (if (near.nonEmpty) s" (did you mean: ${near.mkString(", ")})" else "")
      }
      sys.error(s"unknown query name(s): ${hints.mkString("; ")}")
    }
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
