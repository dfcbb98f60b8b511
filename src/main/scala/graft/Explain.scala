package graft

/** Dev tool: print formatted physical plans for the declared queries (or the
  * names passed as args) so scan pruning (`ReadSchema`), `PushedFilters`,
  * broadcast-join selection, and WholeStageCodegen coverage can be audited.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = GraftSession.local(defaultCpus = 8)
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { n =>
      println(s"\n================ $n ================")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
