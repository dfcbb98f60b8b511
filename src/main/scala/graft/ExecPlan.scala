package graft

/** Dev tool (r17): execute the named queries through the noop sink and print
  * the FINAL adaptive plan — `explain("formatted")` shows the pre-execution
  * plan (`isFinalPlan=false`), which hides AQE's coalesced partition counts;
  * stage-width diagnostics need the executed one.
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 tools/run_main.sh graft.ExecPlan link_parts
  */
object ExecPlan {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "pass query names")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(defaultCpus = 32)
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { n =>
      val df = SparkEntry.queries(n)(spark, dir)
      df.write.mode("overwrite").format("noop").save()
      println(s"\n================ $n (final) ================")
      println(df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
