package graft

import org.apache.spark.sql.functions._

/** Dev tool for the r15 BPE-apply adjudication (r14 verdict item 6):
  * decompose `text_bpe_apply`'s wall into its stages so the "kernelize the
  * merge chain or record that it's already cheap" decision reads off a
  * measurement instead of a guess. Each stage materializes through the
  * noop writer (the Bench discipline — full evaluation, no driver
  * collect); training is primed first so none of the stage timings pay it.
  *
  * Stages (cumulative — each includes the previous):
  *   spellout   — the per-char padded symbol state (st0) alone
  *   replaces   — st0 + the 12 trained literal replaces in rank order
  *   tokens     — + split/filter back to the symbol array (bpeTokens)
  *   full       — the declared query (vocab window + id join + rollup)
  *
  *   SPARK_GRAFT_SF_DIR=/tmp/graft_sf1 tools/run_main.sh graft.BpeProbe
  */
object BpeProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(defaultCpus = 32)
    spark.sparkContext.setLogLevel("ERROR")
    import graft.queries.TextQueries

    val t0 = System.nanoTime()
    val merges = TextQueries.trainedMerges(spark, dir).map(t => (t._2, t._3))
    println(f"train sec=${(System.nanoTime() - t0) / 1e9}%.3f (primed, excluded below)")

    val docs = Tables.documents(spark, dir)
    val st0 = expr(
      "concat_ws('', transform(filter(split(lower(text), ' '), w -> w != ''), " +
        "w -> '  ' || array_join(transform(sequence(1, length(w)), " +
        "i -> substr(w, i, 1)), '  ') || '  '))")
    val applied = merges.foldLeft(st0: org.apache.spark.sql.Column) {
      case (c, (l, r)) => replace(c, lit(s" $l  $r "), lit(s" $l$r "))
    }
    def time(tag: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      // warm-up + median of 3, like Bench
      def once(): Double = {
        val s = System.nanoTime()
        df.write.mode("overwrite").format("noop").save()
        (System.nanoTime() - s) / 1e9
      }
      once()
      val ts = Seq.fill(3)(once()).sorted
      println(f"$tag%-9s median=${ts(1)}%.3f s (min=${ts.head}%.3f max=${ts.last}%.3f)")
    }
    time("scan")(docs.select(col("doc_id"), length(col("text")).as("n")))
    time("spellout")(docs.select(col("doc_id"), length(st0).as("n")))
    time("replaces")(docs.select(col("doc_id"), length(applied).as("n")))
    time("tokens")(TextQueries.bpeTokens(spark, dir)
      .select(col("doc_id"), size(col("syms")).as("n")))
    time("full")(TextQueries.bpeApply(spark, dir))
    spark.stop()
  }
}
