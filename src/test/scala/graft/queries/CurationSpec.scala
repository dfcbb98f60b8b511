package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CurationSpec extends SparkSpec {

  test("curated docs are a subset of the corpus and respect the quality floor") {
    val docs = graft.Tables.documents(spark, sf0001)
    val kept = CurationQueries.curatedDocs(spark, sf0001)
    assert(kept.count() > 0)
    assert(kept.count() <= docs.count())
    // keeper ids exist in the corpus
    assert(kept.join(docs, Seq("doc_id"), "left_anti").count() == 0)
  }

  test("pipeline_dump composes: its doc set is exactly curated ∩ train, spans tile each doc") {
    val dump = CurationQueries.pipelineDump(spark, sf0001).collect()
    val curated = CurationQueries.curatedDocs(spark, sf0001)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val train = graft.Tables.documents(spark, sf0001)
      .withColumn("split", graft.operators.Sampling.splitColumn(
        testPct = CurationQueries.splitTestPct, valPct = CurationQueries.splitValPct))
      .filter(col("split") === "train")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val dumpIds = dump.map(_.getLong(0)).toSet
    assert(dumpIds == (curated intersect train), "dump == curated ∩ train")
    // spans still tile every surviving doc (the packer ran on the filtered set)
    dump.groupBy(_.getLong(0)).foreach { case (_, ss) =>
      val ordered = ss.sortBy(_.getLong(2))
      assert(ordered.head.getLong(3) == 0L)
      assert(ordered.sliding(2).forall(p => p.size < 2 || p(0).getLong(4) == p(1).getLong(3)),
        "spans contiguous within doc")
    }
  }

  test("pipeline_mm_dump composes: text dump's windows exactly, media columns are the decode catalog's (r13 item 3)") {
    val mm = CurationQueries.pipelineMmDump(spark, sf0001).collect()
    val dump = CurationQueries.pipelineDump(spark, sf0001).collect()
    // composition law 1: the packed-window set is byte-identical to the
    // text-only dump's — media columns drop no doc and shift no offset
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))
    assert(mm.map(key).toSet == dump.map(key).toSet && mm.length == dump.length)
    // composition law 2: media rows ≡ dump ⋈ media catalog — each dumped
    // doc's kind/checksum equal the decode layer's, and every dumped doc
    // carries its embedding stats (the corpus is fully cross-modal here)
    val cat = MultimodalQueries.mediaCatalog(spark, sf0001)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    mm.foreach { r =>
      val (kind, sum) = cat(r.getLong(0))
      assert(r.getString(5) == kind && r.getString(6) == sum)
      assert(!r.isNullAt(8) && r.getInt(8) == graft.operators.Similarity.dims)
      assert(!r.isNullAt(9) && r.getDouble(9) > 0.0)
    }
  }

  test("pipeline_tokens composes: every window is exactly seqLen ids except each source's last, and payloads are the tokenized stream") {
    val rows = CurationQueries.pipelineTokens(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(rows.nonEmpty)
    // payload length always equals the declared window token count
    rows.foreach { case (src, seq, toks, ids) =>
      assert(ids.split(" ").length.toLong === toks, s"$src/$seq payload/toks")
      assert(toks <= CurationQueries.seqLen)
    }
    // per source: seq ids are contiguous from the stream start, all full
    // except possibly the last, and total ids = the source's token stream
    val bySrc = rows.groupBy(_._1)
    val streamToks = graft.Tables.documents(spark, sf0001)
      .select(col("source"), explode(split(lower(col("text")), " ")).as("w"))
      .filter(col("w") =!= "").groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    bySrc.foreach { case (src, ws) =>
      val ordered = ws.sortBy(_._2)
      assert(ordered.map(_._2) === ordered.indices.map(_.toLong), s"$src seq gap")
      ordered.init.foreach { case (_, seq, toks, _) =>
        assert(toks === CurationQueries.seqLen, s"$src/$seq not full") }
      assert(ordered.map(_._3).sum === streamToks(src), s"$src total ids")
    }
    // window ids decode through the vocab: every id is in [0, vocabSize]
    val maxId = TextQueries.vocab(spark, sf0001).agg(max("id")).head().getInt(0)
    rows.foreach { case (_, _, _, ids) =>
      ids.split(" ").foreach(i => assert(i.toInt >= 0 && i.toInt <= maxId)) }
  }

  test("writeCorpus partitions by source with readable roundtrip") {
    val out = java.nio.file.Files.createTempDirectory("corpus").toString
    val kept = CurationQueries.curatedDocs(spark, sf0001)
    CurationQueries.writeCorpus(kept, out, maxRecordsPerFile = 100L)
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.nonEmpty && dirs.forall(_.startsWith("source=")))
    val back = spark.read.parquet(out)
    assert(back.count() == kept.count())
    // partition pruning works: one source reads a strict subset of files
    val one = back.filter(col("source") === back.select("source").head().getString(0))
    assert(one.count() > 0 && one.count() < back.count())
    // and it's PLAN-level pruning, not a post-scan filter: the source
    // predicate lands in the scan's PartitionFilters, so at 100 TB the
    // non-matching directories are never listed into tasks at all
    val scan = one.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PartitionFilters: [") && scan.contains("source"),
      s"source predicate missing from PartitionFilters:\n$scan")
  }

  test("curate_classifier learns the gate: accuracy rises to perfect, stopword evidence dominates") {
    val t = CurationQueries.classifier(spark, sf0001).collect()
      .map(r => (r.getInt(0), r.getDouble(2), r.getLong(6), r.getLong(7)))
    assert(t.length == CurationQueries.clfIters)
    val total = t.head._4
    assert(t.forall(_._4 == total))
    // the first iteration can do no better than the class prior; the last
    // must separate the gate exactly on this fixture (the sw>=2 clause is
    // linearly separable through the saturating feature)
    assert(t.last._3 == total, s"final accuracy ${t.last._3} of $total")
    assert(t.last._3 > t.head._3)
    // the gate's binding constraint is stopword evidence: its weight must
    // be the dominant positive coordinate at every iteration after warmup
    assert(t.drop(1).forall(_._2 > 0))
  }

  test("curate_calibration: bins partition the corpus, probabilities and rates stay in [0,1]") {
    val bins = CurationQueries.calibration(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    assert(bins.nonEmpty && bins.forall(b => b._1 >= 0 && b._1 <= 9))
    // bins partition the scored corpus: sizes sum to the doc count and the
    // positive counts sum to the gate's keep count
    val docs = graft.Tables.documents(spark, sf0001).count()
    assert(bins.map(_._2).sum == docs, s"bin sizes ${bins.map(_._2).sum} != $docs")
    bins.foreach { b =>
      assert(b._3 >= 0 && b._3 <= b._2, s"positives out of range: $b")
      assert(b._4 >= 0.0 && b._4 <= 1.0 && b._5 >= 0.0 && b._5 <= 1.0, s"$b")
      // mean predicted probability must sit inside its own decile
      assert(b._4 >= b._1 / 10.0 - 1e-9 && b._4 <= (b._1 + 1) / 10.0 + 1e-9, s"$b")
    }
    // the trained gate separates this fixture perfectly (classifier spec),
    // so calibration must be perfectly sharp at the extremes it populates
    val lo = bins.filter(_._1 <= 2); val hi = bins.filter(_._1 >= 7)
    assert(lo.forall(_._3 == 0L), s"low bins contain positives: ${lo.toSeq}")
    assert(hi.forall(b => b._3 == b._2), s"high bins contain negatives: ${hi.toSeq}")
  }

  test("mix_kcenter: farthest-point invariants — distinct picks, shrinking coverage radius") {
    val t = CurationQueries.kcenter(spark, sf0001).collect()
      .map(r => (r.getInt(0), r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Double])))
    assert(t.length == CurationQueries.kCenterK)
    assert(t.head == ((1, 0L, None)))                  // the seed
    assert(t.map(_._2).distinct.length == t.length)    // no re-picks
    // greedy k-center guarantee: each pick's nearest-selected similarity is
    // non-decreasing (the covering radius can only shrink as the set grows)
    val ms = t.flatMap(_._3)
    assert(ms.length == t.length - 1)
    assert(ms.zip(ms.tail).forall { case (a, b) => a <= b }, ms.toSeq.toString)
  }

  test("mix_group_split: clusters never straddle the boundary; the naive split would leak") {
    val t = CurationQueries.groupSplit(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(t.map(_._1).toSeq == Seq("test", "train"))
    // every doc lands exactly once
    assert(t.map(_._2).sum == graft.Tables.documents(spark, sf0001).count())
    // the operator's reason to exist: zero verified pairs split apart,
    // while the doc-hash baseline would have contaminated eval
    assert(t.forall(_._5 == 0L))
    assert(t.head._4 > 0L, "fixture has no cross-side near-dup pairs to audit")
  }

  test("curate_eval: the gate distiller generalizes to the held-out slice") {
    val cells = CurationQueries.evalGate(spark, sf0001).collect()
      .map(r => (r.getDouble(0), r.getDouble(1)) -> r.getLong(2)).toMap
    val total = cells.values.sum
    // the test slice really is the deterministic 2% (and nonempty)
    assert(total > 0 && total < graft.Tables.documents(spark, sf0001).count() / 10)
    // held-out accuracy: every off-diagonal cell is small relative to the
    // diagonal (the gate is separable through the saturating feature, so on
    // this fixture the confusion is in fact perfectly diagonal)
    val wrong = cells.getOrElse((0.0, 1.0), 0L) + cells.getOrElse((1.0, 0.0), 0L)
    assert(wrong == 0L, s"held-out errors: $cells")
  }
}
