package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantics of the round-4 additions: hybrid RRF fusion, merge/upsert,
  * quality normalization, exact-count reservoir sampling, and the PSI drift
  * profile. The oracle rows pin exact values; these pin the PROPERTIES that
  * make each operator correct (fusion monotonicity, merge completeness,
  * rank bounds, exact strata, PSI non-negativity).
  */
class RetrievalSpec extends SparkSpec {

  test("hybrid agreement row recomputes from the two fusions it measures") {
    val full = RetrievalQueries.hybrid(spark, sf0001)
      .collect().map(_.getLong(0)).zipWithIndex.map { case (id, i) => id -> (i + 1) }.toMap
    val staged = RetrievalQueries.hybridStaged(spark, sf0001)
      .collect().map(_.getLong(0)).zipWithIndex.map { case (id, i) => id -> (i + 1) }.toMap
    val common = full.keySet.intersect(staged.keySet)
    val row = RetrievalQueries.hybridAgree(spark, sf0001).collect().head
    assert(row.getInt(0) == 10)
    assert(row.getLong(1) == common.size)
    assert(row.getDouble(2) == common.size / 10.0)
    val disps = common.toSeq.map(id => math.abs(full(id) - staged(id)))
    assert(row.getLong(3) == disps.sum)
    assert(row.getInt(4) == (if (disps.isEmpty) 0 else disps.max))
  }

  test("IVF-PQ deletion: served ADC results never contain a deleted residue") {
    val ids = SimilarityQueries.indexPqDelete(spark, sf0001)
      .collect().map(_.getLong(0))
    assert(ids.nonEmpty)
    assert(!ids.exists(id => SimilarityQueries.deleteResidues.contains(id % 10)))
  }

  test("hybrid RRF: results come from the arms' union; both-arm docs carry both ranks") {
    val out = RetrievalQueries.hybrid(spark, sf0001).collect()
    assert(out.length == 10)
    // every fused row has at least one rank, and rrf equals the reciprocal sum
    out.foreach { r =>
      val rb = Option(r.getAs[Any]("rb")).map(_.asInstanceOf[Int])
      val rc = Option(r.getAs[Any]("rc")).map(_.asInstanceOf[Int])
      assert(rb.nonEmpty || rc.nonEmpty)
      val expect = rb.map(x => 1.0 / (RetrievalQueries.rrfK + x)).getOrElse(0.0) +
        rc.map(x => 1.0 / (RetrievalQueries.rrfK + x)).getOrElse(0.0)
      assert(math.abs(r.getAs[Double]("rrf") - expect) < 1e-6)
    }
    // fused order is non-increasing in rrf
    val scores = out.map(_.getAs[Double]("rrf")).toSeq
    assert(scores == scores.sorted.reverse)
    // any doc surfaced by both arms outranks what either of its single terms
    // alone would score — the fusion actually fuses
    out.filter(r => r.getAs[Any]("rb") != null && r.getAs[Any]("rc") != null)
      .foreach { r =>
        val single = math.max(
          1.0 / (RetrievalQueries.rrfK + r.getAs[Int]("rb")),
          1.0 / (RetrievalQueries.rrfK + r.getAs[Int]("rc")))
        assert(r.getAs[Double]("rrf") > single)
      }
  }

  test("MMR defers a near-duplicate that naive top-k would take") {
    import spark.implicits._
    // 64-d fixture where relevance and redundancy decouple: the query is
    // axis 0; every candidate carries axis-0 mass (relevance) plus its own
    // side axis. Candidates 1 and 2 share a side axis (near-twins,
    // sim ≈ .9999); 3 and 4 sit on fresh side axes (sim to 1 ≈ .49).
    // Naive rel order is 1 > 2 > 3 > 4; MMR must defer the twin to last.
    def vec(lead: Float, side: Float, sideAxis: Int): Seq[Float] =
      (0 until 64).map(d =>
        if (d == 0) lead else if (d == sideAxis) side else 0.0f)
    val rows = Seq(
      (0L, vec(1.0f, 0.0f, 1), 0),
      (1L, vec(1.0f, 1.0f, 1), 0),   // rel .7071
      (2L, vec(1.0f, 1.02f, 1), 0),  // rel .7001, sim(1,2) ≈ .9999
      (3L, vec(0.95f, 1.0f, 2), 0),  // rel .6886, sim(3,1) ≈ .487
      (4L, vec(0.93f, 1.0f, 3), 0))  // rel .6741
    val dir = java.nio.file.Files.createTempDirectory("graft_mmr").toString
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = RetrievalQueries.mmr(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1)))
    // rank 1 is the raw argmax; the diverse moderates beat the near-twin
    // (twin score .7·.70 − .3·.9999 ≈ .19 vs 3's .7·.69 − .3·.49 ≈ .34),
    // which is exactly what a rel-only top-k gets wrong
    assert(got.toSeq == Seq((1, 1L), (2, 3L), (3, 4L), (4, 2L)), got.toSeq.toString)
  }

  test("merge upsert: row counts balance (base − replaced + updates), statuses complete") {
    val orders = graft.Tables.orders(spark, sf0001)
    val base = orders.count()
    val replaced = orders.filter(col("o_orderkey") % 10 === 0).count()
    val inserted = orders.filter(col("o_orderkey") % 97 === 0).count()
    val out = CoreQueries.q48(spark, sf0001).collect()
    val byStatus = out.map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byStatus("U") == replaced)
    assert(byStatus("N") == inserted)
    assert(out.map(_.getLong(1)).sum == base + inserted)
    // kept rows are exactly the non-replaced base statuses
    assert(out.map(_.getLong(1)).sum - byStatus("U") - byStatus("N") == base - replaced)
  }

  test("quality normalization: q_norm spans [0,1] within every source, monotone in quality") {
    val out = TextQueries.qualityNorm(spark, sf0001)
    val rows = out.collect()
    assert(rows.forall { r =>
      val p = r.getAs[Double]("q_norm"); p >= 0.0 && p <= 1.0
    })
    // within a source, higher quality never gets a lower percentile
    val bySrc = rows.groupBy(_.getAs[String]("source"))
    bySrc.values.foreach { rs =>
      val sorted = rs.sortBy(r => (r.getAs[Double]("quality"), r.getAs[Long]("doc_id")))
      val pr = sorted.map(_.getAs[Double]("q_norm")).toSeq
      assert(pr == pr.sorted, s"percent_rank not monotone in (quality, doc_id)")
    }
  }

  test("reservoir sampling: exactly k docs per source, deterministic across runs") {
    val a = CurationQueries.mixReservoir(spark, sf0001).collect()
    val perSource = a.groupBy(_.getString(0)).view.mapValues(_.length)
    assert(perSource.values.forall(_ == CurationQueries.reservoirPerSource),
      s"uneven strata: ${perSource.toMap}")
    val b = CurationQueries.mixReservoir(spark, sf0001).collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq)
  }

  test("column profile: one row per column, n = table rows, nd ≤ n, mn ≤ mx") {
    val li = graft.Tables.lineitem(spark, sf0001)
    val n = li.count()
    val out = CoreQueries.q49(spark, sf0001).collect()
    assert(out.map(_.getAs[String]("col_name")).toSeq == CoreQueries.profileCols)
    out.foreach { r =>
      assert(r.getAs[Long]("n") == n)
      assert(r.getAs[Long]("nulls") == 0L)
      assert(r.getAs[Long]("nd") <= n && r.getAs[Long]("nd") > 0)
      assert(r.getAs[Double]("mn") <= r.getAs[Double]("mx"))
    }
  }

  test("source overlap: canonical pair order, and a planted mirror dominates the matrix") {
    import spark.implicits._
    // two sources sharing a verbatim 5-word run + one disjoint source
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta", "sA"),
      (2L, "prefix alpha beta gamma delta epsilon suffix", "sB"),
      (3L, "one two three four five six seven", "sC")
    ).toDF("doc_id", "text", "source")
    val m = graft.operators.Dedup.sourceOverlap(docs).collect()
    // only (sA, sB) share 3-grams; pairs are canonical (src_a < src_b)
    assert(m.length == 1 && m.head.getString(0) == "sA" && m.head.getString(1) == "sB")
    // "alpha beta gamma", "beta gamma delta", "gamma delta epsilon" = 3 shared
    assert(m.head.getAs[Long]("shared") == 3L)
  }

  test("PSI drift: non-negative everywhere, and zero when every source has the corpus distribution") {
    val real = CurationQueries.drift(spark, sf0001).collect()
    assert(real.nonEmpty)
    assert(real.forall(_.getAs[Double]("psi") >= 0.0))
    // identical per-source distributions -> psi == 0 for every source
    import spark.implicits._
    val uniform = (0 until 4).flatMap(srcN => (0 until 50).map(i =>
      (s"s$srcN", 100L + i))).toDF("source", "n_chars")
    uniform.createOrReplaceTempView("graft_drift_uniform")
    // reuse the operator body via a temp swap: run the same computation inline
    val env = uniform.agg(min("n_chars").as("mn"), max("n_chars").as("mx"))
    val binned = uniform.crossJoin(broadcast(env))
      .select(col("source"),
        least(floor((col("n_chars") - col("mn")) /
            ((col("mx") - col("mn") + 1) / lit(CurationQueries.driftBins.toDouble))),
          lit(CurationQueries.driftBins - 1)).cast("int").as("bin"))
    val nBins = CurationQueries.driftBins
    def binCounts(tag: String) =
      (0 until nBins).map(i => count(when(col("bin") === i, 1)).as(s"$tag$i"))
    val bySrc = binned.groupBy("source").agg(count(lit(1)).as("n_s"), binCounts("c"): _*)
    val global = binned.agg(count(lit(1)).as("n_g"), binCounts("g"): _*)
    def p(i: Int) = (col(s"c$i") + 1).cast("double") / (col("n_s") + nBins)
    def q(i: Int) = (col(s"g$i") + 1).cast("double") / (col("n_g") + nBins)
    val psi = (0 until nBins).map(i => (p(i) - q(i)) * log(p(i) / q(i))).reduce(_ + _)
    val zeros = bySrc.crossJoin(broadcast(global))
      .select(col("source"), round(psi, 6).as("psi")).collect()
    assert(zeros.forall(_.getAs[Double]("psi") == 0.0), zeros.mkString(","))
  }
}
