package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}

/** Dev probe (r17 optimization round): wall time + scheduler activity for
  * the named declared queries — the graph family's bench rows scale ≈1 from
  * 8→32 cores (BENCH_r16 scaling block), which reads as driver-paced fixed
  * cost (eager rounds, one job per materialization) rather than data volume.
  * This probe counts jobs/stages/tasks per query so the optimization lands
  * on the measured pacing, not the assumed one.
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 tools/run_main.sh graft.GraphProbe graph_pagerank graph_triangles
  */
object GraphProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("graph_pagerank", "graph_ppr", "graph_bfs", "graph_kcore",
        "graph_lpa", "graph_triangles", "graph_common", "graph_assortativity",
        "graph_degree", "link_parts")
    val spark = GraftSession.local(defaultCpus = 32)
    spark.sparkContext.setLogLevel("ERROR")
    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = stages += 1
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = tasks += 1
    })
    names.foreach { n =>
      // warm-up run builds the session backbones (bench medians exclude them)
      SparkEntry.queries(n)(spark, dir)
        .write.mode("overwrite").format("noop").save()
      (1 to 3).foreach { i =>
        System.gc()
        jobs = 0; stages = 0; tasks = 0
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, dir)
          .write.mode("overwrite").format("noop").save()
        val sec = (System.nanoTime() - t0) / 1e9
        Thread.sleep(150) // let the listener bus drain before reading counters
        println(f"$n%-22s run$i $sec%7.3f s  " +
          f"jobs=$jobs%-4d stages=$stages%-4d tasks=$tasks%-5d")
      }
    }
    spark.stop()
  }
}
