package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class DedupSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, sf0001)

  test("exact dedup keeps one id per distinct text") {
    val kept = Dedup.exact(docs).count()
    val distinctTexts = docs.select("text").distinct().count()
    assert(kept == distinctTexts)
  }

  test("shingles: none for docs shorter than n words, distinct per doc") {
    import spark.implicits._
    val tiny = Seq((1L, "a b"), (2L, "a b c a b c")).toDF("doc_id", "text")
    val sh = Dedup.shingles(tiny, 3).collect()
    assert(!sh.map(_.getLong(0)).contains(1L))
    // "a b c a b c" -> 4 shingle positions but only 3 distinct shingles
    assert(sh.count(_.getLong(0) == 2L) == 3)
  }

  test("minhash signatures are deterministic and identical for identical texts") {
    import spark.implicits._
    val two = Seq((1L, "x y z w v u"), (2L, "x y z w v u")).toDF("doc_id", "text")
    val sig = Dedup.minhashSignatures(Dedup.shingleHashes(two, 3), k = 16).collect()
    val a = sig.find(_.getLong(0) == 1L).get
    val b = sig.find(_.getLong(0) == 2L).get
    (1 to 16).foreach(i => assert(a.getLong(i) == b.getLong(i)))
  }

  test("identical docs are LSH candidates and verify at jaccard 1.0") {
    import spark.implicits._
    val two = Seq((1L, "p q r s t u v w"), (2L, "p q r s t u v w"), (3L, "completely different words here now ok yes")).toDF("doc_id", "text")
    val cands = Dedup.minhashCandidates(two)
    val verified = Dedup.jaccardOnCandidates(two, cands, threshold = 0.7).collect()
    assert(verified.length == 1)
    assert(verified.head.getLong(0) == 1L && verified.head.getLong(1) == 2L)
    assert(verified.head.getDouble(2) == 1.0)
  }

  test("signature-agreement Jaccard estimate: 1.0 for identical docs, within [0,1], tracks exact") {
    import spark.implicits._
    val three = Seq(
      (1L, "p q r s t u v w"), (2L, "p q r s t u v w"),
      (3L, "p q r s t u v w x y z zz")).toDF("doc_id", "text")
    val sig = Dedup.minhashSignatures(Dedup.shingleHashes(three))
    val cands = Dedup.candidatePairs(Dedup.bands(sig))
    val est = Dedup.estimatedJaccard(sig, cands).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(est((1L, 2L)) == 1.0)                      // identical docs
    assert(est.values.forall(v => v >= 0.0 && v <= 1.0))
    // the real corpus: every estimate stays in range and covers the cands
    val sigD = Dedup.minhashSignatures(Dedup.shingleHashes(docs))
    val candsD = Dedup.candidatePairs(Dedup.bands(sigD))
    val estD = Dedup.estimatedJaccard(sigD, candsD)
    assert(estD.count() == candsD.count())
    assert(estD.filter(col("est_jac") < 0 || col("est_jac") > 1).count() == 0)
  }

  test("jaccard verification never exceeds candidate set and respects threshold") {
    val cands = Dedup.minhashCandidates(docs)
    val verified = Dedup.jaccardOnCandidates(docs, cands, threshold = 0.7)
    assert(verified.count() <= cands.count())
    assert(verified.filter(col("jac") < 0.7).count() == 0)
  }

  test("contamination flags only docs sharing holdout n-grams") {
    import spark.implicits._
    val corpus = Seq(
      (10L, "alpha beta gamma delta"),      // shares "alpha beta gamma"
      (11L, "totally unrelated words here")).toDF("doc_id", "text")
    val holdout = Seq((1L, "alpha beta gamma epsilon")).toDF("doc_id", "text")
    val hits = Dedup.contamination(corpus, holdout).collect()
    assert(hits.length == 1)
    assert(hits.head.getLong(0) == 10L && hits.head.getLong(1) == 1L)
  }

  test("connected components: chains collapse to min id, isolated pairs stay separate") {
    import spark.implicits._
    val pairs = Seq((2L, 1L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("d1", "d2")
    val got = Dedup.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("connected components reach a true fixpoint on real candidate pairs") {
    val sh = Dedup.shingleHashes(docs).distinct()
    val cands = Dedup.minhashCandidatesFromShingles(sh)
    val verified = Dedup.jaccardOnCandidatesFromShingles(sh, cands, threshold = 0.7)
      .select("d1", "d2")
    val labels = Dedup.connectedComponents(verified).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val edges = verified.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(edges.nonEmpty)
    // every edge's endpoints agree, and each group's label is its min member
    assert(edges.forall { case (a, b) => labels(a) == labels(b) })
    labels.groupBy(_._2).foreach { case (g, members) =>
      assert(members.keys.min == g)
    }
  }

  test("band-bucket cap bounds a degenerate corpus: identical docs yield zero candidates") {
    import spark.implicits._
    // vocabulary collapse: 300 byte-identical docs share every band bucket,
    // so the uncapped self-join would emit 300*299/2 = 44 850 pairs. With a
    // cap below the occupancy the saturated buckets drop out entirely (such
    // floods are exact-dedup's job, which runs first in the curation order).
    val flood = (0L until 300L).map(i => (i, "same words in every doc here")).toDF("doc_id", "text")
    val capped = Dedup.candidatePairs(Dedup.bands(
      Dedup.minhashSignatures(Dedup.shingleHashes(flood))), bucketCap = 16)
    assert(capped.count() == 0)
    // below the cap nothing is pruned: the capped and uncapped sets agree
    val cands = Dedup.minhashCandidates(docs, bandsN = 8)
    val uncapped = Dedup.candidatePairs(Dedup.bands(
      Dedup.minhashSignatures(Dedup.shingleHashes(docs))), bucketCap = Int.MaxValue)
    assert(cands.collect().toSet == uncapped.collect().toSet)
  }

  test("duplicateSpans finds cross-doc verbatim runs, never intra-doc repeats") {
    import spark.implicits._
    val shared = "one two three four five six seven eight"
    val corpus = Seq(
      (1L, s"prefix words here $shared"),
      (2L, s"$shared and a different suffix"),
      // doc 3 repeats its own span twice but shares it with nobody
      (3L, "a b c d e f g h a b c d e f g h")).toDF("doc_id", "text")
    val spans = Dedup.duplicateSpans(corpus, w = 8).collect()
    // exactly the shared 8-word run, attributed to both docs, keeper = min id
    assert(spans.length == 1)
    assert(spans.head.getLong(1) == 2L)      // ndocs
    assert(spans.head.getLong(2) == 1L)      // first_doc
    // minDocs above the span's doc count empties the result
    assert(Dedup.duplicateSpans(corpus, w = 8, minDocs = 3).count() == 0)
  }

  test("spanCoverage scores each doc by the fraction of its spans other docs contain") {
    import spark.implicits._
    val shared = "one two three four five six seven eight"
    val corpus = Seq(
      // doc 1: 2 distinct spans, 1 shared with doc 2 → 0.5
      (1L, s"p1 p2 p3 p4 p5 p6 p7 $shared"),
      // doc 2: IS the shared span → 1.0 (fully covered elsewhere)
      (2L, shared),
      // doc 3: self-repeats only — distinct frame means df stays 1 → 0.0
      (3L, "a b c d e f g h a b c d e f g h")).toDF("doc_id", "text")
    val got = Dedup.spanCoverage(
        Dedup.shingleHashes(corpus, 8).distinct())
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got(1L)._3 > 0.0 && got(1L)._3 < 1.0, got(1L))
    assert(got(1L)._2 == 1L) // exactly the shared span
    assert(got(2L) == ((1L, 1L, 1.0)), got(2L))
    assert(got(3L)._2 == 0L && got(3L)._3 == 0.0, got(3L))
  }

  test("simhash band cap bounds a degenerate corpus the same way") {
    import spark.implicits._
    val flood = (0L until 100L).map(i => (i, "same words in every doc here")).toDF("doc_id", "text")
    val sims = Dedup.simhash(flood)
    assert(Dedup.simhashPairs(sims, maxHamming = 3, bucketCap = 16).count() == 0)
    assert(Dedup.simhashPairs(sims, maxHamming = 3, bucketCap = 1000).count() == 100L * 99 / 2)
  }

  test("pointer jumping closes a 200-node chain in O(log n) rounds") {
    import spark.implicits._
    val chain = (0L until 199L).map(i => (i, i + 1)).toDF("d1", "d2")
    // plain min propagation would need 199 rounds; the jump doubles reach per
    // round, so 12 suffice (and the guard THROWS when rounds run out instead
    // of returning wrong labels).
    val labels = Dedup.connectedComponents(chain, maxIters = 12).collect()
    assert(labels.length == 200 && labels.forall(_.getLong(1) == 0L))
    intercept[IllegalStateException] {
      Dedup.connectedComponents(chain, maxIters = 3).collect()
    }
  }

  test("jump threshold: stars converge in the pre-jump rounds; a mixed graph still meets the log bound") {
    import spark.implicits._
    // Pointer jumping engages at round 3 (Dedup.connectedComponents). This
    // pins both sides of that threshold: a star (diameter 2 — the common
    // near-dup cluster shape) must converge within the 2 PLAIN rounds, so
    // small clusters never pay the jump's extra self-join...
    val star = (1L to 30L).map(i => (0L, i)).toDF("d1", "d2")
    val starLabels = Dedup.connectedComponents(star, maxIters = 2).collect()
    assert(starLabels.length == 31 && starLabels.forall(_.getLong(1) == 0L))
    // ...while a 200-node chain living alongside it in the same pair set
    // still closes within the jump's log bound, star labels undisturbed.
    val mixed = star.union((100L until 299L).map(i => (i, i + 1)).toDF("d1", "d2"))
    val mixedLabels = Dedup.connectedComponents(mixed, maxIters = 12).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((0L to 30L).forall(mixedLabels(_) == 0L))
    assert((100L to 299L).forall(mixedLabels(_) == 100L))
  }

  test("connected components of an empty pair set is empty") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("d1", "d2")
    assert(Dedup.connectedComponents(empty).count() == 0)
  }

  test("native SimhashAgg matches the 64-conditional-sums formulation bit-for-bit") {
    val a = Dedup.simhash(docs).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = Dedup.simhashSums(docs).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
  }

  test("simhash fingerprints span the full 64 bits") {
    val fps = Dedup.simhash(docs).collect().map(_.getLong(1))
    // bit 63 is set with p~0.5 per doc; over the corpus both signs must occur
    assert(fps.exists(_ < 0L) && fps.exists(_ >= 0L))
    // and the upper half is not constant (the old 32-bit version had it all-zero)
    assert(fps.map(_ >>> 32).distinct.length > 1)
  }

  test("simhash of identical texts identical; hamming to itself is 0") {
    import spark.implicits._
    val two = Seq((1L, "m n o p q r"), (2L, "m n o p q r")).toDF("doc_id", "text")
    val s = Dedup.simhash(two).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(s(1L) == s(2L))
    val pairs = Dedup.simhashPairs(Dedup.simhash(two), maxHamming = 0).collect()
    assert(pairs.length == 1 && pairs.head.getLong(2) == 0L)
  }

  test("staged incremental estimates equal the one-shot pipeline's cross-pair estimates") {
    import org.apache.spark.sql.functions._
    val cutoff = 250L
    Dedup.stageMinhashIndex(docs.filter(col("doc_id") < cutoff),
      "graft_test_incr_sig", "graft_test_incr_bands")
    // threshold 0.0: compare the FULL candidate estimate sets, not just keepers
    val staged = Dedup.incrementalEstimatesStaged(spark,
        "graft_test_incr_sig", "graft_test_incr_bands",
        docs.filter(col("doc_id") >= cutoff), threshold = 0.0)
      .orderBy("d1", "d2").collect().toSeq
    val sig = Dedup.minhashSignatures(Dedup.shingleHashes(docs))
    val cands = Dedup.candidatePairs(Dedup.bands(sig))
      .filter(col("d1") < cutoff && col("d2") >= cutoff)
    val oneShot = Dedup.estimatedJaccard(sig, cands)
      .orderBy("d1", "d2").collect().toSeq
    assert(staged.nonEmpty && staged == oneShot)
  }

  test("prefix filtering is EXACT on the real corpus: verified pairs equal the all-pairs truth") {
    val sh = Dedup.shingleHashes(docs).distinct().localCheckpoint(true)
    // ground truth: unrestricted shingle self-join (fine at sf0.001)
    val allCands = sh.select(col("doc_id").as("d1"))
      .join(sh.select(col("doc_id").as("d2")), col("d1") < col("d2")).distinct()
    def pairs(cands: org.apache.spark.sql.DataFrame) =
      Dedup.jaccardOnCandidatesFromShingles(sh, cands, threshold = 0.7)
        .select(col("d1"), col("d2"), round(col("jac"), 6))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val truth = pairs(allCands)
    val got = pairs(Dedup.prefixFilterCandidates(sh))
    assert(got === truth, "prefix filtering must lose no true pair")
    assert(truth.nonEmpty, "fixture must contain near-dup pairs")
    // and it must actually FILTER: far fewer candidates than all pairs
    val nAll = allCands.count(); val nPf = Dedup.prefixFilterCandidates(sh).count()
    assert(nPf < nAll / 4, s"prefix filter kept $nPf of $nAll pairs — not filtering")
  }

  test("array verify equals the shingle-join verify bit-for-bit (Jaccard and containment)") {
    // the staged-array scorers are a SHUFFLE-SHAPE rewrite of the
    // (pair, shingle) equi-join verify, not an approximation: identical
    // intersection counts, identical division, on the full all-pairs frame
    val sh = Dedup.shingleHashes(docs).distinct().localCheckpoint(true)
    val arrays = Dedup.shingleArrays(sh).localCheckpoint(true)
    val allCands = sh.select(col("doc_id").as("d1"))
      .join(sh.select(col("doc_id").as("d2")), col("d1") < col("d2")).distinct()
      .localCheckpoint(true)
    def canon(df: org.apache.spark.sql.DataFrame, score: String) =
      df.select(col("d1"), col("d2"), round(col(score), 6))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val jacJoin = canon(Dedup.jaccardOnCandidatesFromShingles(sh, allCands, 0.7), "jac")
    val jacArr = canon(Dedup.jaccardOnCandidatesFromArrays(arrays, allCands, 0.7), "jac")
    assert(jacJoin.nonEmpty && jacArr == jacJoin)
    val contJoin = canon(Dedup.containmentOnCandidatesFromShingles(sh, allCands, 0.8), "cont")
    val contArr = canon(Dedup.containmentOnCandidatesFromArrays(arrays, allCands, 0.8), "cont")
    assert(contJoin.nonEmpty && contArr == contJoin)
    // r13 ADVICE: a non-scale-4 threshold (1.0/3) must not throw — the
    // Double-typed API falls back to the double comparison and still
    // agrees with the shingle-join scorer at that threshold
    val t3 = 1.0 / 3
    val jacThird = canon(Dedup.jaccardOnCandidatesFromArrays(arrays, allCands, t3), "jac")
    assert(jacThird == canon(Dedup.jaccardOnCandidatesFromShingles(sh, allCands, t3), "jac"))
    val contThird = canon(Dedup.containmentOnCandidatesFromArrays(arrays, allCands, t3), "cont")
    assert(contThird == canon(Dedup.containmentOnCandidatesFromShingles(sh, allCands, t3), "cont"))
  }

  test("prefix filtering finds a pair at EXACTLY the 0.7 threshold (integer prefix arithmetic)") {
    import spark.implicits._
    // A: a1..a19 -> 17 shingles; B: a1..a16,b1..b3 -> 14 shared + 3 own.
    // inter=14, union=20, J=0.7 exactly >= 7/10 — a float-ceil prefix length
    // could miss it; the (7n+9) div 10 form must not.
    val a = (1 to 19).map(i => s"a$i").mkString(" ")
    val b = ((1 to 16).map(i => s"a$i") ++ (1 to 3).map(i => s"b$i")).mkString(" ")
    val d = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
    val sh = Dedup.shingleHashes(d).distinct()
    val cands = Dedup.prefixFilterCandidates(sh).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(cands.toSet === Set((1L, 2L)))
    val ver = Dedup.jaccardOnCandidatesFromShingles(sh, Dedup.prefixFilterCandidates(sh), 0.7)
      .collect()
    assert(ver.length == 1 && math.abs(ver(0).getAs[Double]("jac") - 0.7) < 1e-12)
  }
}
