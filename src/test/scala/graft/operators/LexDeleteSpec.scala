package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** The lexical deletion lifecycle's Lucene-semantics contracts: the
  * tombstoned probe filters RESULTS but scores with the UNCHANGED stale
  * stats (bit-equal to the undeleted probe minus the deleted rows), and
  * the merge physically removes exactly the tombstoned docs, rebuilds the
  * exact reduced-corpus ledger, and drops the tombstones.
  */
class LexDeleteSpec extends SparkSpec {

  private val buckets = graft.queries.RetrievalQueries.lexBuckets
  private val terms = graft.queries.RetrievalQueries.lexTerms

  test("stale-stats shadow then exact-stats merge") {
    val docs = Tables.documents(spark, sf0001)
    val t = "graft_spec_lexdel"
    TextIndex.stageIndex(docs, t, buckets)
    Bucketing.dropStaged(spark, s"${t}_tomb")
    val deleted = docs.filter(col("doc_id") % 10 === 3)
    TextIndex.deleteFromIndex(deleted, t)
    val delIds = deleted.select("doc_id").collect().map(_.getLong(0)).toSet

    // Lucene staleness: the tombstoned probe must equal the undeleted
    // probe with deleted rows dropped — same df, same n/avgdl, same scores
    val shadowed = TextIndex.probeIndexTombstoned(spark, t, terms, k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(shadowed.nonEmpty && !shadowed.exists(p => delIds(p._1)))
    val fullMinus = TextIndex.probeIndex(spark, t, terms, k = 10 + delIds.size)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
      .filterNot(p => delIds(p._1)).take(10).toSeq
    assert(shadowed == fullMinus,
      "tombstoned probe must be the stale-stats ranking minus deleted rows")

    // merge: postings purged, ledger exact over survivors, tombstones gone
    TextIndex.mergeDeletes(spark, t, buckets)
    assert(Bucketing.read(spark, t)
      .filter(col("doc_id").isin(delIds.toSeq: _*)).count() == 0)
    val ledger = spark.table(s"${t}_stats")
      .agg(sum("n"), sum("total_dl")).head()
    val expected = Bucketing.read(spark, t)
      .groupBy("doc_id").agg(max("dl").as("dl"))
      .agg(count(lit(1)), sum("dl")).head()
    assert(ledger.getLong(0) == expected.getLong(0) &&
      ledger.getLong(1) == expected.getLong(1))
    assert(!spark.catalog.tableExists(s"${t}_tomb"))
    // and post-merge scores differ from stale ones (the reduced corpus's
    // n/avgdl/df legitimately re-rank — the merge is visible, as in Lucene)
    val post = TextIndex.probeIndex(spark, t, terms, k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(post.map(_._2) != shadowed.map(_._2))
  }
}
