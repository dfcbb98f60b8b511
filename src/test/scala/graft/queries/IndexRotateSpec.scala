package graft.queries

import graft.SparkSpec

/** The codebook-rotation lifecycle's contracts beyond the oracle row
  * (r14 verdict item 4): the gate's decision matches the recall
  * comparison, the loser's staging table is gone afterward (no abandoned
  * `_next` artifact accumulating in the warehouse), and the LIVE table
  * serves the winning generation — which [[SimilarityQueries.indexRotate]]
  * already requires in-flow against the one-shot arm; the spec adds the
  * catalog end-state the in-flow check can't see.
  */
class IndexRotateSpec extends SparkSpec {

  test("rotation gate: decision frame is coherent and the catalog holds exactly the live table") {
    val rows = SimilarityQueries.indexRotate(spark, sf0001).collect()
    // one row per gate query, each carrying its own recalls + the batch means
    assert(rows.length == SimilarityQueries.rotateGateQueries)
    assert(rows.map(_.getLong(0)).toSeq ==
      (0L until SimilarityQueries.rotateGateQueries.toLong))
    val s1 = rows.map(_.getLong(2)).sum
    val s2 = rows.map(_.getLong(4)).sum
    val swapped = rows.head.getBoolean(8)
    // the swap decision is the MEAN comparison (r16 verdict item 2), and
    // every row repeats the same batch-level decision columns
    assert(swapped == (s2 >= s1),
      s"gate decision $swapped contradicts summed hits $s1 vs $s2")
    rows.foreach { row =>
      assert(row.getDouble(3) == row.getLong(2) / 10.0)
      assert(row.getDouble(5) == row.getLong(4) / 10.0)
      // mean columns are round-6 in the declared row
      val denom = (SimilarityQueries.rotateGateQueries * 10).toDouble
      assert(math.abs(row.getDouble(6) - s1 / denom) < 5e-7)
      assert(math.abs(row.getDouble(7) - s2 / denom) < 5e-7)
      assert(row.getBoolean(8) == swapped)
    }
    val live = SimilarityQueries.rotateIvfTable(sf0001)
    assert(spark.catalog.tableExists(live), "live serving table missing")
    assert(!spark.catalog.tableExists(live + "_next"),
      "rotation left its staging table behind")
    // the bucket spec must SURVIVE the catalog rename: a swap that served
    // correct answers through an unbucketed table would turn every probe
    // into a corpus scan — correctness green, scale silently lost
    if (swapped) {
      val plan = graft.operators.Similarity
        .probeStagedIvf(spark, live,
          graft.Tables.embeddings(spark, sf0001)
            .filter(org.apache.spark.sql.functions.col("vec_id") === 0)
            .select("embedding").head().getSeq[Float](0).toArray,
          probeCids = Seq(0L, 1L), k = 10)
        .queryExecution.executedPlan.toString
      val m = "SelectedBucketsCount: (\\d+) out of (\\d+)".r.findFirstMatchIn(plan)
      assert(m.isDefined, s"post-swap probe lost bucket pruning:\n$plan")
      assert(m.get.group(1).toInt < m.get.group(2).toInt, m.get.group(0))
    }
  }

  test("the composed staged re-rank lifts (never lowers) the pure-ADC staged arm's recall") {
    def recallOfArm(df: org.apache.spark.sql.DataFrame): Long =
      df.collect().head.getLong(1) // hits column of the shared rollup
    val adc = recallOfArm(SimilarityQueries.recallIvfPq(spark, sf0001))
    val reranked = recallOfArm(SimilarityQueries.recallIvfPqRerank(spark, sf0001))
    // same probed lists, same candidate pool ⊇ ADC top-k: exact re-rank
    // can only fix order within the pool, never lose a true hit the ADC
    // top-k already had
    assert(reranked >= adc, s"re-rank read $reranked hits vs ADC's $adc")
  }

  test("the MaxSim media probe returns only kind-matching payloads, never the query") {
    val probe = MultimodalQueries.searchMaxSim(spark, sf0001)
    val ids = probe.select("doc_id").collect().map(_.getLong(0))
    assert(ids.nonEmpty && !ids.contains(0L))
    import org.apache.spark.sql.functions.col
    val kinds = MultimodalQueries.mediaCatalog(spark, sf0001)
      .filter(col("doc_id").isin(ids: _*))
      .select("kind").distinct().collect().map(_.getString(0)).toSet
    assert(kinds == Set(MultimodalQueries.searchKind), kinds)
  }
}
