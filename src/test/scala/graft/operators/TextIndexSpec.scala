package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class TextIndexSpec extends SparkSpec {
  import spark.implicits._

  private val terms = Seq("join", "scan", "merge")

  private def freshName(tag: String) =
    s"ti_spec_${tag}_${java.lang.Long.toUnsignedString(System.nanoTime(), 36)}"

  test("staged probe ranks exactly like scoring the corpus on the fly") {
    val docs = Tables.documents(spark, sf0001)
    val t = freshName("diff")
    TextIndex.stageIndex(docs, t, buckets = 8)
    val staged = TextIndex.probeIndex(spark, t, terms, k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq

    // on-the-fly reference: same tokenization, same BM25 arithmetic
    val toks = docs.select(col("doc_id"), explode(split(lower(col("text")), " ")).as("w"))
      .filter(col("w") =!= "")
    val dl = toks.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    val stats = dl.agg(count(lit(1)).cast("double").as("n"),
      (sum("dl").cast("double") / count(lit(1))).as("avgdl"))
    val tf = toks.filter(col("w").isin(terms: _*)).groupBy("doc_id", "w")
      .agg(count(lit(1)).as("tf"))
    val dfreq = toks.filter(col("w").isin(terms: _*)).select("doc_id", "w").distinct()
      .groupBy("w").agg(count(lit(1)).as("df"))
    val fly = tf.join(dfreq, "w").join(dl, "doc_id").crossJoin(broadcast(stats))
      .select(col("doc_id"),
        (log(lit(1.0) + (col("n") - col("df") + 0.5) / (col("df") + 0.5)) *
          (col("tf") * 2.2) /
          (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / col("avgdl")))).as("ts"))
      .groupBy("doc_id")
      .agg(round(expr(
        "aggregate(array_sort(collect_list(ts)), CAST(0.0 AS DOUBLE), (a, x) -> a + x)"), 6)
        .as("bm25"))
      .orderBy(desc("bm25"), asc("doc_id")).limit(10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq

    assert(staged === fly)
  }

  test("append folds a batch in: probe equals a full restage, stats stay exact") {
    val docs = Tables.documents(spark, sf0001)
    val old = docs.filter(col("doc_id") < 400)
    val batch = docs.filter(col("doc_id") >= 400)
    val incr = freshName("incr")
    val full = freshName("full")
    TextIndex.stageIndex(old, incr, buckets = 8)
    TextIndex.appendToIndex(batch, incr, buckets = 8)
    TextIndex.stageIndex(docs, full, buckets = 8)

    val a = TextIndex.probeIndex(spark, incr, terms, k = 20).collect().toSeq
    val b = TextIndex.probeIndex(spark, full, terms, k = 20).collect().toSeq
    assert(a === b)

    // the incremental index's stats ledger (one row per batch) sums to the
    // full restage's single row
    val si = spark.table(s"${incr}_stats").agg(sum("n"), sum("total_dl")).head()
    val sf = spark.table(s"${full}_stats").agg(sum("n"), sum("total_dl")).head()
    assert(si.getLong(0) === sf.getLong(0) && si.getLong(1) === sf.getLong(1))
    assert(spark.table(s"${incr}_stats").count() === 2,
      "append should add a ledger row, not rewrite the stats")
  }

  test("recomputeStats rebuilds the exact ledger from postings after a torn append") {
    val docs = Tables.documents(spark, sf0001)
    val t = freshName("recover")
    TextIndex.stageIndex(docs.filter(col("doc_id") < 400), t, buckets = 8)
    TextIndex.appendToIndex(docs.filter(col("doc_id") >= 400), t, buckets = 8)
    val before = spark.table(s"${t}_stats").agg(sum("n"), sum("total_dl")).head()
    // simulate the torn-append failure mode: postings present, stats row
    // lost. Deterministically lose the APPEND batch's ledger row (keep the
    // stage batch's = the smaller n), so every run recovers from the same
    // failure state.
    Bucketing.writeTable(
      spark.table(s"${t}_stats").orderBy(asc("n")).limit(1), s"${t}_stats_tmp")
    Bucketing.writeTable(spark.table(s"${t}_stats_tmp"), s"${t}_stats")
    TextIndex.recomputeStats(spark, t)
    val after = spark.table(s"${t}_stats").agg(sum("n"), sum("total_dl")).head()
    assert(after.getLong(0) === before.getLong(0) &&
      after.getLong(1) === before.getLong(1))
  }

  test("zero-token docs are excluded from n by BOTH the ledger and the rebuild") {
    // Pins the invariant batchStats and recomputeStats must share: a doc
    // whose text tokenizes to nothing contributes no postings, so neither
    // path may count it in n — if either ever starts counting empty docs,
    // the recovery rebuild would silently diverge from the live ledger.
    val docs = Seq((1L, "alpha beta"), (2L, ""), (3L, "   "), (4L, "gamma"))
      .toDF("doc_id", "text")
    val t = freshName("empty")
    TextIndex.stageIndex(docs, t, buckets = 4)
    val staged = spark.table(s"${t}_stats").head()
    assert(staged.getLong(0) === 2L, "ledger must exclude the two empty docs")
    TextIndex.recomputeStats(spark, t)
    val rebuilt = spark.table(s"${t}_stats").head()
    assert(rebuilt.getLong(0) === staged.getLong(0) &&
      rebuilt.getLong(1) === staged.getLong(1),
      "rebuild must agree with the ledger on empty-doc exclusion")
  }

  test("probing a term absent from the corpus returns empty, not an error") {
    val t = freshName("abs")
    TextIndex.stageIndex(Tables.documents(spark, sf0001), t, buckets = 8)
    assert(TextIndex.probeIndex(spark, t, Seq("zzzznotaword"), k = 5).count() === 0)
  }

  test("the probe scan is bucket-pruned to the queried terms' buckets") {
    val t = freshName("prune")
    TextIndex.stageIndex(Tables.documents(spark, sf0001), t, buckets = 8)
    val plan = TextIndex.probeIndex(spark, t, terms, k = 10)
      .queryExecution.executedPlan.toString
    val m = "SelectedBucketsCount: (\\d+) out of (\\d+)".r.findFirstMatchIn(plan)
    assert(m.isDefined, s"postings scan is not bucket-pruned:\n$plan")
    val (sel, total) = (m.get.group(1).toInt, m.get.group(2).toInt)
    assert(sel <= terms.length && sel < total, s"read $sel of $total buckets")
  }
}
