package graft.queries

import graft.SparkSpec

/** The staged hybrid row's fusion contract, checked INDEPENDENTLY of the
  * oracle: the fused top-10 must be exactly the RRF rollup of the two
  * staged arms' own top-[[RetrievalQueries.armDepth]] rankings — recomputed
  * here from the arm outputs in plain Scala, so a fusion bug that happened
  * to cancel inside the composed SQL text could not hide.
  */
class HybridStagedSpec extends SparkSpec {

  test("fused ranking recomputes from the two staged arms") {
    import org.apache.spark.sql.functions._
    val d = RetrievalQueries.armDepth
    // the lexical arm re-derived through an independently staged index
    // (same terms, same BM25 constants as the declared row's probe)
    val t = "graft_spec_hyb_lex"
    graft.operators.TextIndex.stageIndex(
      graft.Tables.documents(spark, sf0001), t, RetrievalQueries.lexBuckets)
    val bm = graft.operators.TextIndex.probeIndex(spark, t,
        RetrievalQueries.lexTerms, k = d,
        k1 = TextQueries.bm25K1, b = TextQueries.bm25B)
      .collect().map(_.getLong(0)).zipWithIndex
      .map { case (id, i) => id -> (i + 1) }.toMap
    val cos = SimilarityQueries.ivfStagedAdaptivePool(spark, sf0001, k = d)
      .collect().map(_.getLong(0)).zipWithIndex
      .map { case (id, i) => id -> (i + 1) }.toMap
    val k = RetrievalQueries.rrfK
    def rrf(id: Long): Double =
      bm.get(id).map(r => 1.0 / (k + r)).getOrElse(0.0) +
        cos.get(id).map(r => 1.0 / (k + r)).getOrElse(0.0)
    // Spark's round() is BigDecimal HALF_UP, not rint's half-even
    val expected = (bm.keySet ++ cos.keySet).toSeq
      .map(id => (id, BigDecimal(rrf(id))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
      .sortBy { case (id, s) => (-s, id) }
      .take(10)
    val fused = RetrievalQueries.hybridStaged(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(fused == expected, s"fused $fused\nexpected $expected")
  }
}
