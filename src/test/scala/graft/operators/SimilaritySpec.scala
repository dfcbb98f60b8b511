package graft.operators

import graft.{SparkSpec, Tables}

class SimilaritySpec extends SparkSpec {

  private lazy val emb = Tables.embeddings(spark, sf0001)

  test("brute-force top-k: the query vector ranks first with cosine 1.0") {
    val top = Similarity.bruteForceTopK(emb, queryId = 0L, k = 10).collect()
    assert(top.length == 10)
    assert(top.head.getLong(0) == 0L)
    assert(top.head.getDouble(1) == 1.0)
    // descending
    val sims = top.map(_.getDouble(1)).toSeq
    assert(sims == sims.sorted.reverse)
  }

  test("LSH top-k contains the query vector (hamming 0 to itself)") {
    val top = Similarity.lshTopK(emb, queryId = 0L, k = 10, maxHamming = 2).collect()
    assert(top.nonEmpty)
    assert(top.head.getLong(0) == 0L && top.head.getDouble(1) == 1.0)
  }

  test("native LshCode expression matches the HOF formulation bit-for-bit") {
    import org.apache.spark.sql.functions.col
    val both = Similarity.withLshCode(emb)
      .withColumn("hof", Similarity.lshCodeHof("embedding"))
    assert(both.filter(col("lsh_code") =!= col("hof")).count() == 0)
  }

  test("LSH codes are deterministic across runs") {
    val a = Similarity.withLshCode(emb).select("vec_id", "lsh_code").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = Similarity.withLshCode(emb).select("vec_id", "lsh_code").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
    assert(a.values.forall(c => c >= 0 && c < (1L << Similarity.lshPlanes)))
  }

  test("native LongDotProduct matches the HOF integer dot on quantized codes") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val coded = Similarity.withQuantized(graft.Tables.embeddings(spark, sf0001))
      .select(col("vec_id"), col("qcodes"))
    val native = ColumnBridge.column(graft.expressions.LongDotProduct(
      ColumnBridge.expression(col("qcodes")), ColumnBridge.expression(col("qcodes"))))
    val rows = coded.select(col("vec_id"), native.as("a"),
        Similarity.idotHof(col("qcodes"), col("qcodes")).as("b"))
      .collect()
    assert(rows.nonEmpty && rows.forall(r => r.getLong(1) == r.getLong(2)))
  }

  test("random projection: outDims float components, deterministic, preserves self-similarity") {
    import org.apache.spark.sql.functions._
    val emb = graft.Tables.embeddings(spark, sf0001)
    val rp = Similarity.withRandomProjection(emb).select("vec_id", "rp")
    val first = rp.collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(first.values.forall(_.length == 16))
    // deterministic: a second evaluation is bit-identical
    val again = Similarity.withRandomProjection(emb).select("vec_id", "rp")
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(first == again)
    // cosine(rp, rp) = 1 for any non-zero projection
    val self = rp.select(graft.functions.VectorOps.cosine(col("rp"), col("rp")).as("c"))
      .collect().map(_.getDouble(0))
    assert(self.forall(c => c == 0.0 || math.abs(c - 1.0) < 1e-12))
  }

  test("planesFor scales the code space with the corpus and floors at the oracle width") {
    assert(Similarity.planesFor(500L) == Similarity.lshPlanes)
    assert(Similarity.planesFor(65536L) == Similarity.lshPlanes)
    // 1e9 docs / 64 per bucket needs ceil(log2(15.6e6)) = 24 bits
    assert(Similarity.planesFor(1000000000L) == 24)
    // monotone, capped at 32
    assert(Similarity.planesFor(Long.MaxValue / 2) == 32)
    val ns = Seq(1L, 1000L, 100000L, 10000000L, 1000000000L, 100000000000L)
    assert(ns.map(Similarity.planesFor(_)) == ns.map(Similarity.planesFor(_)).sorted)
    // the batch-ANN floor engages below its own regime but still grows
    assert(Similarity.planesFor(500L, floor = 8) == 8)
    assert(Similarity.planesFor(1000000000L, floor = 8) == 24)
  }

  test("centroidsFor scales IVF lists with the corpus and floors at the oracle count") {
    assert(Similarity.centroidsFor(500L) == Similarity.ivfCentroids)
    assert(Similarity.centroidsFor(65536L) == Similarity.ivfCentroids)
    assert(Similarity.centroidsFor(1000000000L) == 1977)
  }

  test("near-dup pairs honors an explicit plane override (wider code, fewer candidates)") {
    val wide = Similarity.nearDupPairs(emb, threshold = 0.3, planesOpt = Some(24)).count()
    val narrow = Similarity.nearDupPairs(emb, threshold = 0.3, planesOpt = Some(8)).count()
    assert(wide <= narrow)
  }

  test("IVF top-k: query vector ranks first; results are a subset of brute force universe") {
    val top = Similarity.ivfTopK(emb, queryId = 0L).collect()
    assert(top.nonEmpty)
    // vec 0 is its own nearest centroid's list member -> always found
    assert(top.head.getLong(0) == 0L && top.head.getDouble(1) == 1.0)
    val sims = top.map(_.getDouble(1)).toSeq
    assert(sims == sims.sorted.reverse)
  }

  test("PQ: codebook vectors encode to their own id; codes bounded; ADC is deterministic") {
    import org.apache.spark.sql.functions.col
    val cb = Similarity.pqCodebook(emb)
    assert(cb.count() == Similarity.pqM.toLong * Similarity.pqK)
    val codes = Similarity.pqEncode(emb, cb)
    // every code is a valid codeword id
    assert(codes.filter(col("code") < 0 || col("code") >= Similarity.pqK).count() == 0)
    // a codeword's source vector is L2-distance 0 from its own codeword in
    // every subspace, so it must encode to itself
    val self = codes.filter(col("vec_id") < Similarity.pqK)
      .filter(col("code") =!= col("vec_id")).count()
    assert(self == 0)
    // ADC ranking is reproducible run to run (fixed fold order in the score)
    val a = Similarity.pqTopK(emb, queryId = 0L, k = 10).collect().toSeq
    val b = Similarity.pqTopK(emb, queryId = 0L, k = 10).collect().toSeq
    assert(a == b && a.length == 10)
  }

  test("IVF-PQ results are PQ-ranked members of the probed IVF lists") {
    import org.apache.spark.sql.functions.col
    val ivfpq = Similarity.ivfPqTopK(emb, queryId = 0L, k = 10).collect()
    assert(ivfpq.length == 10)
    // every returned id must be in the candidate set ivfTopK would search
    // (same centroids, same 2-list probe) — the IVF part restricts, the PQ
    // part only re-ranks
    val ivfUniverse = Similarity.ivfTopK(emb, queryId = 0L, k = Int.MaxValue - 1)
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    assert(ivfpq.map(_.getLong(0)).forall(ivfUniverse.contains))
    // deterministic
    assert(Similarity.ivfPqTopK(emb, queryId = 0L, k = 10).collect().toSeq == ivfpq.toSeq)
  }

  test("int8 quantization: codes bounded, self-similarity 1.0, ranking tracks exact cosine") {
    import org.apache.spark.sql.functions._
    val coded = Similarity.withQuantized(emb)
    assert(coded.selectExpr("max(aggregate(qcodes, CAST(0 AS BIGINT), (a, x) -> greatest(a, abs(x))))")
      .head().getLong(0) <= 127L)
    val top = Similarity.quantTopK(emb, queryId = 0L, k = 10).collect()
    assert(top.head.getLong(0) == 0L && top.head.getDouble(1) == 1.0)
    assert(top.forall(r => r.getDouble(1) >= -1.0 && r.getDouble(1) <= 1.0))
    // int8 cosine is a close approximation: top-10 sets mostly agree
    val exact = Similarity.bruteForceTopK(emb, queryId = 0L, k = 10)
      .collect().map(_.getLong(0)).toSet
    assert(top.map(_.getLong(0)).toSet.intersect(exact).size >= 6)
  }

  test("trainCentroids: k rows, improves (never degrades) the assignment objective") {
    import org.apache.spark.sql.functions._
    import graft.functions.VectorOps
    def objective(cent: org.apache.spark.sql.DataFrame): Double =
      emb.crossJoin(broadcast(cent))
        .select(col("vec_id"), VectorOps.cosine(col("embedding"), col("ce")).as("c"))
        .groupBy("vec_id").agg(max(col("c")).as("mc"))
        .agg(avg(col("mc"))).head.getDouble(0)
    val init = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cid"), col("embedding").as("ce"))
    val trained = Similarity.trainCentroids(emb, k = 8, iters = 3)
    assert(trained.count() == 8)
    assert(trained.select("cid").collect().map(_.getLong(0)).sorted.toSeq == (0L until 8L))
    assert(objective(trained) >= objective(init) - 1e-6)
  }

  test("ivfTopK accepts a trained codebook and still finds the query vector first") {
    val trained = Similarity.trainCentroids(emb, k = 8, iters = 2)
    val top = Similarity.ivfTopK(emb, queryId = 0L, trained = Some(trained)).collect()
    assert(top.nonEmpty)
    assert(top.head.getLong(0) == 0L && top.head.getDouble(1) == 1.0)
  }

  test("staged LSH probe equals the unstaged Hamming-1 formulation (pruning changes I/O, not results)") {
    import org.apache.spark.sql.functions._
    val planes = 8
    Similarity.stageLshBucketed(emb, "graft_test_ann_lsh", planes, buckets = 16)
    val q = Similarity.withLshCode(emb.filter(col("vec_id") === 0), "embedding", planes)
      .select(col("embedding"), col("lsh_code")).head()
    val staged = Similarity.probeStagedLsh(spark, "graft_test_ann_lsh",
      q.getSeq[Float](0).toArray, q.getLong(1), planes, k = 10).collect().toSeq
    val coded = Similarity.withLshCode(emb, "embedding", planes)
    val unstaged = coded.crossJoin(broadcast(coded.filter(col("vec_id") === 0)
        .select(col("embedding").as("qe"), col("lsh_code").as("qcode"))))
      .filter(expr("bit_count(lsh_code ^ qcode)") <= 1)
      .select(col("vec_id"),
        round(graft.functions.VectorOps.cosine(col("embedding"), col("qe")), 6).as("cos_sim"))
      .orderBy(desc("cos_sim"), asc("vec_id")).limit(10).collect().toSeq
    assert(staged.nonEmpty && staged == unstaged)
  }

  test("staged LSH index append: stage-then-append equals staging everything at once") {
    import org.apache.spark.sql.functions._
    val planes = 8
    // day 0: stage the first 400 vectors; day 1: append the remaining batch
    Similarity.stageLshBucketed(emb.filter(col("vec_id") < 400),
      "graft_test_ann_lsh_incr", planes, buckets = 16)
    Similarity.appendStagedLsh(emb.filter(col("vec_id") >= 400),
      "graft_test_ann_lsh_incr", planes, buckets = 16)
    Similarity.stageLshBucketed(emb, "graft_test_ann_lsh_full", planes, buckets = 16)
    val q = Similarity.withLshCode(emb.filter(col("vec_id") === 0), "embedding", planes)
      .select(col("embedding"), col("lsh_code")).head()
    def probe(t: String) = Similarity.probeStagedLsh(spark, t,
      q.getSeq[Float](0).toArray, q.getLong(1), planes, k = 10)
    assert(probe("graft_test_ann_lsh_incr").collect().toSeq ==
      probe("graft_test_ann_lsh_full").collect().toSeq)
    // pruning survives the append: the probe still reads a strict subset of buckets
    val plan = probe("graft_test_ann_lsh_incr").queryExecution.executedPlan.toString
    val m = "SelectedBucketsCount: (\\d+) out of (\\d+)".r.findFirstMatchIn(plan)
    assert(m.isDefined, plan)
    assert(m.get.group(1).toInt < m.get.group(2).toInt)
  }

  test("staged IVF index append: stage-then-append equals staging everything at once") {
    import org.apache.spark.sql.functions._
    val cent = emb.filter(col("vec_id") < Similarity.ivfCentroids)
      .select(col("vec_id").as("cid"), col("embedding").as("ce"))
    Similarity.stageIvfBucketed(emb.filter(col("vec_id") < 400), cent,
      "graft_test_ann_ivf_incr", buckets = 8)
    Similarity.appendStagedIvf(emb.filter(col("vec_id") >= 400), cent,
      "graft_test_ann_ivf_incr", buckets = 8)
    Similarity.stageIvfBucketed(emb, cent, "graft_test_ann_ivf_full", buckets = 8)
    val qe = emb.filter(col("vec_id") === 0).select("embedding")
      .head().getSeq[Float](0).toArray
    def probe(t: String) = Similarity.probeStagedIvf(spark, t, qe, Seq(0L, 1L), k = 10)
    assert(probe("graft_test_ann_ivf_incr").collect().toSeq ==
      probe("graft_test_ann_ivf_full").collect().toSeq)
    // pruning survives the append
    val plan = probe("graft_test_ann_ivf_incr").queryExecution.executedPlan.toString
    val m = "SelectedBucketsCount: (\\d+) out of (\\d+)".r.findFirstMatchIn(plan)
    assert(m.isDefined, plan)
    assert(m.get.group(1).toInt < m.get.group(2).toInt)
  }

  test("LSH reconcile repairs a torn append: missing rows re-appended, probe matches a full restage") {
    import org.apache.spark.sql.functions._
    val planes = 8
    // stage day 0, then simulate a TORN day-1 append: only half the batch's
    // rows were committed before the crash (vec_id parity picks the half
    // deterministically)
    Similarity.stageLshBucketed(emb.filter(col("vec_id") < 400),
      "graft_test_ann_lsh_torn", planes, buckets = 16)
    Similarity.appendStagedLsh(
      emb.filter(col("vec_id") >= 400 && col("vec_id") % 2 === 0),
      "graft_test_ann_lsh_torn", planes, buckets = 16)
    val (missing, dups) = Similarity.reconcileStagedLsh(
      emb, "graft_test_ann_lsh_torn", planes, buckets = 16)
    assert(missing > 0, "the torn half must be detected as missing")
    assert(dups === 0L)
    // converged: re-running reconcile finds nothing left to repair
    assert(Similarity.reconcileStagedLsh(
      emb, "graft_test_ann_lsh_torn", planes, buckets = 16) === ((0L, 0L)))
    Similarity.stageLshBucketed(emb, "graft_test_ann_lsh_tornfull", planes, buckets = 16)
    val q = Similarity.withLshCode(emb.filter(col("vec_id") === 0), "embedding", planes)
      .select(col("embedding"), col("lsh_code")).head()
    def probe(t: String) = Similarity.probeStagedLsh(spark, t,
      q.getSeq[Float](0).toArray, q.getLong(1), planes, k = 10)
    assert(probe("graft_test_ann_lsh_torn").collect().toSeq ==
      probe("graft_test_ann_lsh_tornfull").collect().toSeq)
  }

  test("LSH reconcile reports duplicated ids from a blind append retry (restage signal)") {
    import org.apache.spark.sql.functions._
    val planes = 8
    Similarity.stageLshBucketed(emb.filter(col("vec_id") < 400),
      "graft_test_ann_lsh_dup", planes, buckets = 16)
    val batch = emb.filter(col("vec_id") >= 400)
    Similarity.appendStagedLsh(batch, "graft_test_ann_lsh_dup", planes, buckets = 16)
    Similarity.appendStagedLsh(batch, "graft_test_ann_lsh_dup", planes, buckets = 16)
    val (missing, dups) = Similarity.reconcileStagedLsh(
      emb, "graft_test_ann_lsh_dup", planes, buckets = 16)
    assert(missing === 0L)
    assert(dups === batch.count(), "every double-appended id must be reported")
  }

  test("IVF and IVF-PQ reconcile repair torn appends through their own encode paths") {
    import org.apache.spark.sql.functions._
    val cent = emb.filter(col("vec_id") < Similarity.ivfCentroids)
      .select(col("vec_id").as("cid"), col("embedding").as("ce"))
    Similarity.stageIvfBucketed(emb.filter(col("vec_id") < 400), cent,
      "graft_test_ann_ivf_torn", buckets = 8)
    Similarity.appendStagedIvf(
      emb.filter(col("vec_id") >= 400 && col("vec_id") % 2 === 0), cent,
      "graft_test_ann_ivf_torn", buckets = 8)
    val (im, id) = Similarity.reconcileStagedIvf(
      emb, cent, "graft_test_ann_ivf_torn", buckets = 8)
    assert(im > 0 && id === 0L)
    Similarity.stageIvfBucketed(emb, cent, "graft_test_ann_ivf_tornfull", buckets = 8)
    val qe = emb.filter(col("vec_id") === 0).select("embedding")
      .head().getSeq[Float](0).toArray
    assert(Similarity.probeStagedIvf(spark, "graft_test_ann_ivf_torn", qe, Seq(0L, 1L), k = 10)
      .collect().toSeq ==
      Similarity.probeStagedIvf(spark, "graft_test_ann_ivf_tornfull", qe, Seq(0L, 1L), k = 10)
        .collect().toSeq)

    val cb = Similarity.pqCodebookResidual(emb, cent)
    Similarity.stageIvfPqBucketed(emb.filter(col("vec_id") < 400), cent, cb,
      "graft_test_ann_ivfpq_torn", buckets = 8)
    Similarity.appendStagedIvfPq(
      emb.filter(col("vec_id") >= 400 && col("vec_id") % 2 === 0), cent, cb,
      "graft_test_ann_ivfpq_torn", buckets = 8)
    val (pm, pd) = Similarity.reconcileStagedIvfPq(
      emb, cent, cb, "graft_test_ann_ivfpq_torn", buckets = 8)
    assert(pm > 0 && pd === 0L)
    Similarity.stageIvfPqBucketed(emb, cent, cb, "graft_test_ann_ivfpq_tornfull", buckets = 8)
    assert(Similarity.probeStagedIvfPq(spark, "graft_test_ann_ivfpq_torn", emb, 0L, Seq(0L, 1L), k = 10)
      .collect().toSeq ==
      Similarity.probeStagedIvfPq(spark, "graft_test_ann_ivfpq_tornfull", emb, 0L, Seq(0L, 1L), k = 10)
        .collect().toSeq)
  }

  test("staged IVF probe equals ivfTopK (lists staged once vs assigned per query)") {
    import org.apache.spark.sql.functions._
    val cent = emb.filter(col("vec_id") < Similarity.ivfCentroids)
      .select(col("vec_id").as("cid"), col("embedding").as("ce"))
    Similarity.stageIvfBucketed(emb, cent, "graft_test_ann_ivf", buckets = 8)
    val qe = emb.filter(col("vec_id") === 0).select("embedding").head().getSeq[Float](0).toArray
    val probeCids = cent
      .select(col("cid"), graft.functions.VectorOps.cosine(col("ce"), typedlit(qe)).as("qcos"))
      .orderBy(desc("qcos"), asc("cid")).limit(2).collect().map(_.getLong(0)).toSeq
    val staged = Similarity.probeStagedIvf(spark, "graft_test_ann_ivf", qe, probeCids, k = 10)
      .collect().toSeq
    val unstaged = Similarity.ivfTopK(emb, queryId = 0L, k = 10).collect().toSeq
    assert(staged.nonEmpty && staged == unstaged)
  }

  test("staged IVF-PQ probe equals the one-shot ivfPqTopK composition") {
    import org.apache.spark.sql.functions._
    val cent = emb.filter(col("vec_id") < Similarity.ivfCentroids)
      .select(col("vec_id").as("cid"), col("embedding").as("ce"))
    Similarity.stageIvfPqBucketed(emb, cent, Similarity.pqCodebookResidual(emb, cent),
      "graft_test_ann_ivfpq", buckets = 8)
    val qe = emb.filter(col("vec_id") === 0).select("embedding").head().getSeq[Float](0).toArray
    val probeCids = cent
      .select(col("cid"), graft.functions.VectorOps.cosine(col("ce"), typedlit(qe)).as("qcos"))
      .orderBy(desc("qcos"), asc("cid")).limit(2).collect().map(_.getLong(0)).toSeq
    val staged = Similarity.probeStagedIvfPq(spark, "graft_test_ann_ivfpq", emb,
      0L, probeCids, k = 10).collect().toSeq
    val oneShot = Similarity.ivfPqTopK(emb, queryId = 0L, k = 10,
      centroidsNOpt = Some(Similarity.ivfCentroids)).collect().toSeq
    assert(staged.nonEmpty && staged == oneShot)
    // the probe reads only the probed lists' buckets AND never a float vector
    val plan = Similarity.probeStagedIvfPq(spark, "graft_test_ann_ivfpq", emb,
      0L, probeCids, k = 10).queryExecution.executedPlan.toString
    val m = "SelectedBucketsCount: (\\d+) out of (\\d+)".r.findFirstMatchIn(plan)
    assert(m.isDefined, plan)
    assert(m.get.group(1).toInt <= 2 && m.get.group(1).toInt < m.get.group(2).toInt)
  }

  test("staged IVF-PQ append: stage-then-append equals staging everything at once") {
    import org.apache.spark.sql.functions._
    val cent = emb.filter(col("vec_id") < Similarity.ivfCentroids)
      .select(col("vec_id").as("cid"), col("embedding").as("ce"))
    val cb = Similarity.pqCodebookResidual(emb, cent)
    Similarity.stageIvfPqBucketed(emb.filter(col("vec_id") < 400), cent, cb,
      "graft_test_ann_ivfpq_incr", buckets = 8)
    Similarity.appendStagedIvfPq(emb.filter(col("vec_id") >= 400), cent, cb,
      "graft_test_ann_ivfpq_incr", buckets = 8)
    Similarity.stageIvfPqBucketed(emb, cent, cb,
      "graft_test_ann_ivfpq_full", buckets = 8)
    val qe = emb.filter(col("vec_id") === 0).select("embedding").head().getSeq[Float](0).toArray
    val probeCids = cent
      .select(col("cid"), graft.functions.VectorOps.cosine(col("ce"), typedlit(qe)).as("qcos"))
      .orderBy(desc("qcos"), asc("cid")).limit(2).collect().map(_.getLong(0)).toSeq
    def probe(t: String) =
      Similarity.probeStagedIvfPq(spark, t, emb, 0L, probeCids, k = 20).collect().toSeq
    assert(probe("graft_test_ann_ivfpq_incr") == probe("graft_test_ann_ivfpq_full"))
  }

  test("mean pooling: planted vectors pool to their exact componentwise mean") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val df = Seq(
      (0, Array(1.0f, 2.0f)), (0, Array(3.0f, 4.0f)),
      (1, Array(0.0f, 0.0f)), (1, Array(2.0f, 2.0f)))
      .toDF("label", "embedding")
    val cents = Similarity.meanPoolCentroids(df)
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1).toSeq).toMap
    assert(cents(0) === Seq(2.0, 3.0))
    assert(cents(1) === Seq(1.0, 1.0))
    // the pooled-centroid cosine path agrees with direct computation
    val m = Seq((Array(2.0, 3.0), Array(1.0, 1.0))).toDF("a", "b")
      .select(round(Similarity.doubleCosine("a", "b"), 6)).head().getDouble(0)
    val expected = (2.0 + 3.0) / (math.sqrt(4 + 9) * math.sqrt(2))
    assert(math.abs(m - expected) < 1e-6)
  }

  test("standardizing against the dim profile recenters every dimension to mean 0, sd 1") {
    import org.apache.spark.sql.functions._
    val profile = Similarity.dimProfile(emb)
    val white = Similarity.standardize(emb, profile)
    // re-profile the standardized corpus: means collapse to ~0, sds to ~1
    val re = white.select(posexplode(col("embedding"))).toDF("pos", "x")
      .groupBy("pos").agg(avg("x").as("m"), stddev(col("x")).as("s"))
      .collect()
    assert(re.length === Similarity.dims)
    re.foreach { r =>
      assert(math.abs(r.getDouble(1)) < 1e-4, s"pos ${r.getInt(0)} mean ${r.getDouble(1)}")
      assert(math.abs(r.getDouble(2) - 1.0) < 1e-2, s"pos ${r.getInt(0)} sd ${r.getDouble(2)}")
    }
  }

  test("standardize rejects a profile wider than the literal-plan bound") {
    import org.apache.spark.sql.functions._
    val wide = spark.range(Similarity.standardizeMaxDims + 1)
      .select(col("id").cast("int").as("pos"), lit(0.0).as("mean"), lit(1.0).as("sd"))
    val e = intercept[IllegalArgumentException] {
      Similarity.standardize(emb, wide)
    }
    assert(e.getMessage.contains("broadcast-join"))
  }

  test("standardize emits 0.0 for a constant dimension instead of Infinity/NaN") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // dim 1 is constant (sd = 0): unguarded (x-mean)/sd would be NaN/Inf
    val df = Seq(
      (0L, Array(1.0f, 5.0f)), (1L, Array(2.0f, 5.0f)), (2L, Array(3.0f, 5.0f)))
      .toDF("vec_id", "embedding")
    val white = Similarity.standardize(df, Similarity.dimProfile(df))
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toSeq).toMap
    white.values.foreach(v =>
      v.foreach(x => assert(!x.isNaN && !x.isInfinite, s"poisoned component $x")))
    assert(white.values.forall(_(1) === 0.0), "constant dim should whiten to 0.0")
    assert(white(0L)(0) < 0 && white(2L)(0) > 0, "varying dim still standardizes")
  }

  test("nearest-centroid assignment: planted orthogonal clusters classify perfectly") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // two orthogonal clusters with slight within-cluster jitter
    val rows = (0 until 10).map { i =>
      val base = if (i % 2 == 0) Array(1.0, 0.1 * (i % 3), 0.0, 0.0)
                 else Array(0.0, 0.0, 1.0, 0.1 * (i % 3))
      (i.toLong, i % 2, base)
    }
    val df = rows.toDF("vec_id", "label", "ev")
    val cent = Similarity.meanPoolCentroids(
      df.select(col("label"), col("ev").as("embedding")), vecCol = "embedding")
      .select(col("label").as("pred"), col("centroid"))
    val confusion = df.crossJoin(broadcast(cent))
      .select(col("vec_id"), col("label"), col("pred"),
        Similarity.doubleCosine("ev", "centroid").as("ccos"))
      .groupBy("vec_id")
      .agg(first(col("label")).as("label"),
        max_by(col("pred"), struct(col("ccos"), (-col("pred")).as("tie"))).as("pred"))
      .groupBy("label", "pred").count().collect()
    assert(confusion.forall(r => r.getInt(0) == r.getInt(1)),
      s"off-diagonal assignments: ${confusion.toSeq}")
  }

  test("recall@k harness: one row, hits bounded by k, recall = hits/k; query 0 always hits") {
    for (q <- Seq(
        graft.queries.SimilarityQueries.recallLsh(spark, sf0001),
        graft.queries.SimilarityQueries.recallIvf(spark, sf0001))) {
      val r = q.collect()
      assert(r.length == 1)
      val (k, hits, recall) = (r.head.getInt(0), r.head.getLong(1), r.head.getDouble(2))
      assert(k == 10)
      // vec 0 (the query itself, cosine 1.0, Hamming 0 / its own list) is in
      // both arms, so recall is never 0; the intersection can't exceed k.
      assert(hits >= 1L && hits <= k)
      assert(math.abs(recall - hits.toDouble / k) < 1e-9)
    }
    // the trio is a real discriminator: on this corpus the coarse IVF lists
    // retain the true neighbors while the Hamming code balls lose most
    // (low-cosine neighbors differ in many bits); multi-table amplification
    // can only widen the single-table candidate union — the measured order
    // lsh ≤ multi ≤ ivf is the configuration signal the harness exists for
    val lsh = graft.queries.SimilarityQueries.recallLsh(spark, sf0001)
      .head().getDouble(2)
    val multi = graft.queries.SimilarityQueries.recallMulti(spark, sf0001)
      .head().getDouble(2)
    val ivf = graft.queries.SimilarityQueries.recallIvf(spark, sf0001)
      .head().getDouble(2)
    assert(lsh <= multi && multi <= ivf, s"lsh=$lsh multi=$multi ivf=$ivf")
  }

  test("trained residual codebook: Lloyd moves the stand-in and the arm stays harness-valid") {
    import org.apache.spark.sql.functions.col
    // the codebook artifact actually trains: after 2 iterations at least
    // one codeword differs from the stand-in (Lloyd with a non-degenerate
    // sample cannot be a global no-op here), empty codewords keep their
    // stand-in cells, and the (j, k) key set is exactly M×K
    val emb = graft.Tables.embeddings(spark, sf0001)
    val cent = emb.filter(col("vec_id") < Similarity.ivfCentroids)
      .select(col("vec_id").as("cid"), col("embedding").as("ce"))
    val standIn = Similarity.pqCodebookResidual(emb, cent)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getSeq[Double](2)).toMap
    val trained = Similarity.trainPqCodebookResidual(emb, cent, iters = 2)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getSeq[Double](2)).toMap
    assert(trained.keySet == standIn.keySet)
    assert(trained.keySet.size == Similarity.pqM * Similarity.pqK)
    assert(trained.exists { case (k, v) => standIn(k) != v }, "training was a no-op")
    // harness invariants of the declared rows
    val r = graft.queries.SimilarityQueries.recallIvfPqTrained(spark, sf0001).head()
    assert(r.getInt(0) == 10 && r.getLong(1) <= 10 &&
      math.abs(r.getDouble(2) - r.getLong(1) / 10.0) < 1e-9)
    val standInRecall = graft.queries.SimilarityQueries
      .recallIvfPq(spark, sf0001).head().getDouble(2)
    info(s"ADC recall at sf0.001: stand-in $standInRecall, trained ${r.getDouble(2)}")
  }

  test("whitened IVF arm: measured recall + silhouette shift vs the raw readings (r13 item 4)") {
    // the spectral family says the corpus has a dominant direction and C72
    // trains the transform that removes it; these rows MEASURE whether the
    // served arm benefits. Harness invariants + the recorded comparison:
    val w = graft.queries.SimilarityQueries.recallWhite(spark, sf0001).head()
    assert(w.getInt(0) == 10 && w.getLong(1) <= 10 &&
      math.abs(w.getDouble(2) - w.getLong(1) / 10.0) < 1e-9)
    val raw = graft.queries.SimilarityQueries.recallIvf(spark, sf0001)
      .head().getDouble(2)
    info(s"recall vs RAW truth at sf0.001: raw-IVF $raw, whitened-IVF ${w.getDouble(2)}")
    // the whitened probe must still be a pruned index read, not a scan
    val p = graft.queries.SimilarityQueries.whiteIvfTopK(spark, sf0001)
      .queryExecution.executedPlan.toString
    val m = "SelectedBucketsCount: (\\d+) out of (\\d+)".r.findFirstMatchIn(p)
    assert(m.isDefined && m.get.group(1).toInt <= 2 &&
      m.get.group(1).toInt < m.get.group(2).toInt,
      s"whitened probe not bucket-pruned:\n$p")
    // silhouette twin runs and keeps the rollup shape (one row per label)
    val sil = graft.queries.SimilarityQueries.silhouetteWhite(spark, sf0001).collect()
    val silRaw = graft.queries.SimilarityQueries.silhouette(spark, sf0001).collect()
    assert(sil.map(_.getInt(0)).toSeq == silRaw.map(_.getInt(0)).toSeq)
    info(s"mean silhouette label 0: raw ${silRaw.head.getDouble(2)}, whitened ${sil.head.getDouble(2)}")
  }

  test("filtered ANN: the IVF arm serves the predicate at least as well as the LSH arm") {
    import org.apache.spark.sql.functions.col
    // r11 verdict item 2: the LSH filtered arm measured recall 0.0 at sf1
    // while unfiltered IVF measured 1.0 — the filtered probe now exists on
    // the IVF arm and must dominate the LSH arm wherever both run
    // (measured: 0.5 vs 0.3 at sf0.01, 1.0 vs 0.0 at sf1 — SCALE_r12.md)
    val lshF = graft.queries.SimilarityQueries.recallFilter(spark, sf0001).head()
    val ivfF = graft.queries.SimilarityQueries.recallFilterIvf(spark, sf0001).head()
    info(s"filtered recall sf0.001: ivf ${ivfF.getDouble(2)} vs lsh ${lshF.getDouble(2)}")
    assert(ivfF.getLong(1) >= lshF.getLong(1),
      s"ivf filtered hits ${ivfF.getLong(1)} < lsh filtered ${lshF.getLong(1)}")
    // pre-filtering contract: every served row satisfies the predicate
    val ids = graft.queries.SimilarityQueries.filteredIvfTopK(spark, sf0001)
      .collect().map(_.getLong(0)).toSet
    val pop = graft.Tables.embeddings(spark, sf0001)
      .filter(col("label") === graft.queries.SimilarityQueries.filterLabel)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(ids.nonEmpty && ids.subsetOf(pop),
      s"filtered probe leaked non-predicate rows: ${ids -- pop}")
  }

  test("batch-ANN recall: measured per query, consistent with the single-query staged arm") {
    // r10 verdict item 6: the staged batch serving path shipped without a
    // measured recall — a serving path without a number is a config guess.
    // The reading on this corpus (hits 0/1/0 of 5 at sf0.001) is the SAME
    // signal the single-query LSH arm's 0.1 gives: hyperplane codes lose
    // these low-cosine neighbors, serve this corpus via IVF. The values are
    // pinned so a probe-width or coding change cannot silently shift the
    // measurement.
    val r = graft.queries.SimilarityQueries.recallBatch(spark, sf0001)
      .collect().map(x => (x.getLong(0), x.getInt(1), x.getLong(2), x.getDouble(3)))
    assert(r.map(_._1).toSeq == Seq(0L, 1L, 2L), r.toSeq)
    assert(r.forall(_._2 == 5), r.toSeq)
    assert(r.forall(x => math.abs(x._4 - x._3.toDouble / 5) < 1e-9), r.toSeq)
    assert(r.map(_._3).toSeq == Seq(0L, 1L, 0L), s"measured reading moved: ${r.toSeq}")
    // and the batch arm really is the single-query staged arm, batched:
    // query 0's candidate list must equal sim_lsh_staged's top rows with
    // the self row dropped (the batch contract excludes query==candidate)
    val batch0 = graft.queries.SimilarityQueries.batchStagedTopK(spark, sf0001)
      .filter(org.apache.spark.sql.functions.col("query_id") === 0L)
      .collect().map(_.getAs[Long]("cand_id")).toSeq
    val single = graft.queries.SimilarityQueries.lshStagedTopK(spark, sf0001)
      .collect().map(_.getAs[Long]("vec_id")).toSeq
    assert(batch0 == single.filter(_ != 0L).take(5),
      s"batch arm diverged from the staged single-query arm: $batch0 vs $single")
  }

  test("multi-table LSH: table 0 reproduces single-table codes; the union strictly widens candidates") {
    import org.apache.spark.sql.functions._
    // planeOffset 0 must be byte-identical to the original single-table code
    val single = Similarity.withLshCode(emb).select("vec_id", "lsh_code").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val t0 = Similarity.withLshCode(emb, planeOffset = 0, codeCol = "c0")
      .select("vec_id", "c0").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(single == t0)
    // a different family really is different
    val t1 = Similarity.withLshCode(emb, planeOffset = Similarity.lshPlanes, codeCol = "c1")
      .select("vec_id", "c1").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(t0 != t1)
    // the multi-table result contains the query itself at cosine 1.0
    val top = Similarity.lshMultiTopK(emb, queryId = 0L, k = 10).collect()
    assert(top.head.getLong(0) == 0L && top.head.getDouble(1) == 1.0)
  }

  test("semantic near-dup: planted same-cluster duplicates pair at cos 1.0; scope is the cluster") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // four orthogonal 4-dim clusters; ids 0-3 are the stand-in centroids.
    // 100/101 duplicate centroid 0's direction, 200 duplicates centroid 1's.
    def unit(axis: Int): Array[Float] =
      Array.tabulate(4)(i => if (i == axis) 1f else 0f)
    val rows = Seq(
      0L -> unit(0), 1L -> unit(1), 2L -> unit(2), 3L -> unit(3),
      100L -> unit(0).map(_ * 2f), 101L -> unit(0).map(_ * 3f),
      200L -> unit(1).map(_ * 5f))
    val emb = rows.toDF("vec_id", "embedding")
    val pairs = Similarity.semanticNearDupPairs(emb, threshold = 0.99,
        centroidsNOpt = Some(4))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    // exactly the within-cluster duplicate pairs, nothing cross-cluster
    assert(pairs == Set(
      (0L, 0L, 100L, 1.0), (0L, 0L, 101L, 1.0), (0L, 100L, 101L, 1.0),
      (1L, 1L, 200L, 1.0)))
  }

  test("semantic near-dup on real data: v1 < v2, cos above threshold, cid is a real centroid") {
    val rows = graft.queries.DedupQueries.semantic(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) < r.getLong(2))
      assert(r.getDouble(3) >= graft.queries.DedupQueries.semanticThreshold)
      assert(r.getLong(0) >= 0L && r.getLong(0) < Similarity.ivfCentroids)
    }
  }

  test("near-dup pairs are symmetric-free (d1 < d2) and above threshold") {
    val pairs = Similarity.nearDupPairs(emb, threshold = 0.3).collect()
    assert(pairs.forall(r => r.getLong(0) < r.getLong(1)))
    assert(pairs.forall(_.getDouble(2) >= 0.3))
  }

  test("k-means|| seeding spreads seeds across planted clusters where positional init cannot") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // 4 orthogonal clusters; ALL the smallest ids sit in cluster 0, the
    // exact corpus layout that makes trainCentroids' smallest-id init
    // degenerate (4 identical seeds). k-means|| must escape it.
    val dims = 8
    def unit(axis: Int): Seq[Float] =
      (0 until dims).map(i => if (i == axis) 1.0f else 0.0f)
    val docs = (0L until 200L).map { id =>
      val cluster = if (id < 50) 0 else ((id - 50) / 50 + 1).toInt
      (id, unit(cluster * 2))
    }.toDF("vec_id", "embedding")
    val seeds = Similarity.kmeansParInit(docs, k = 4, rounds = 3).collect()
    assert(seeds.length == 4)
    val clustersCovered = seeds.map(_.getSeq[Float](1).indexWhere(_ > 0.5f)).toSet
    assert(clustersCovered.size == 4,
      s"seeds cover only axes $clustersCovered of 4 planted clusters")
    // deterministic: a second run yields the identical seed set
    val again = Similarity.kmeansParInit(docs, k = 4, rounds = 3).collect()
    assert(seeds.map(_.getLong(0)).toSeq == again.map(_.getLong(0)).toSeq)
    // and Lloyd from these seeds keeps one centroid per cluster
    val trained = Similarity.trainCentroids(docs, k = 4, iters = 2,
      initOpt = Some(Similarity.kmeansParInit(docs, k = 4, rounds = 3)))
    val axes = trained.collect().map(_.getSeq[Float](1).indexWhere(_ > 0.5f)).toSet
    assert(axes.size == 4, s"trained centroids collapsed to axes $axes")
  }
}
