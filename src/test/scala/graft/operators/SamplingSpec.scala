package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class SamplingSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, sf0001)
  private def allSources: Seq[String] =
    docs.select("source").distinct().collect().map(_.getString(0)).toSeq

  test("mixSample is deterministic and monotone in rate (supersets as rates rise)") {
    val lowRates = allSources.map(_ -> 0.3).toMap
    val highRates = allSources.map(_ -> 0.7).toMap
    val low = Sampling.mixSample(docs, lowRates).select("doc_id").collect().map(_.getLong(0)).toSet
    val low2 = Sampling.mixSample(docs, lowRates).select("doc_id").collect().map(_.getLong(0)).toSet
    val high = Sampling.mixSample(docs, highRates).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(low == low2)            // reproducible
    assert(low.subsetOf(high))     // raising rates only adds docs
    assert(low.nonEmpty && high.size < docs.count())
  }

  test("temperatureSample flattens source proportions and keeps ~targetFrac") {
    import spark.implicits._
    // 900 docs from "big", 100 from "small": alpha 0.5 should up-weight the
    // small source's keep RATE well above the big one's
    val skewed = ((1L to 900L).map(i => (i, "big")) ++ (901L to 1000L).map(i => (i, "small")))
      .toDF("doc_id", "source")
    val kept = Sampling.temperatureSample(skewed, alpha = 0.5, targetFrac = 0.5)
    val bySrc = kept.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = bySrc.values.sum
    assert(total > 350 && total < 650, s"~half expected, got $total")
    val bigRate = bySrc.getOrElse("big", 0L).toDouble / 900
    val smallRate = bySrc.getOrElse("small", 0L).toDouble / 100
    assert(smallRate > bigRate * 2,
      s"small source should be up-weighted: small=$smallRate big=$bigRate")
    // deterministic
    assert(Sampling.temperatureSample(skewed, 0.5, 0.5).count() == total)
  }

  test("temperatureSample at alpha=1 reproduces natural proportions (uniform rate)") {
    import spark.implicits._
    val skewed = ((1L to 300L).map(i => (i, "a")) ++ (301L to 400L).map(i => (i, "b")))
      .toDF("doc_id", "source")
    // alpha=1 -> every source's rate equals targetFrac exactly; keep counts
    // then binomial around 0.4 of each source
    val kept = Sampling.temperatureSample(skewed, alpha = 1.0, targetFrac = 0.4)
    val bySrc = kept.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc("a") > 60 && bySrc("a") < 180)
    assert(bySrc("b") > 15 && bySrc("b") < 65)
  }

  test("mixSample: unlisted sources use the default rate") {
    val none = Sampling.mixSample(docs, Map("no-such-source" -> 1.0))
    assert(none.count() == 0) // defaultRate 0.0 drops everything else
    val all = Sampling.mixSample(docs, Map.empty, defaultRate = 1.0)
    assert(all.count() == docs.count())
  }

  test("weightedSample: degenerate weights, determinism, and per-doc monotonicity") {
    import org.apache.spark.sql.functions.lit
    assert(Sampling.weightedSample(docs, lit(0.0)).count() == 0)
    assert(Sampling.weightedSample(docs, lit(1.0)).count() == docs.count())
    def ids(w: Double): Set[Long] =
      Sampling.weightedSample(docs, lit(w)).select("doc_id")
        .collect().map(_.getLong(0)).toSet
    val half = ids(0.5)
    assert(ids(0.5) == half)          // reproducible
    assert(half.subsetOf(ids(0.8)))   // raising weight only adds docs
    assert(ids(0.2).subsetOf(half))
    // uses a different salt than mixSample, so the two samplers are
    // independent draws, not the same cut at different thresholds
    val mixHalf = Sampling.mixSample(docs, allSources.map(_ -> 0.5).toMap)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(half != mixHalf)
  }

  test("packShards is chunkWidth-invariant: two-level equals the single-window form") {
    // chunkWidth = Long.MaxValue collapses to one chunk per source — the
    // original single-window formulation; any other width must produce the
    // SAME cumulative sums, hence the same shard assignments.
    def packed(w: Long): Set[(Long, Long)] =
      Sampling.packShards(docs, 500L, chunkWidth = w)
        .select("doc_id", "shard").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val single = packed(Long.MaxValue)
    assert(packed(1L) == single)
    assert(packed(7L) == single)
    assert(packed(64L) == single)
  }

  test("mixSplit column: deterministic, exhaustive, and stable under corpus growth") {
    val split = docs.withColumn("split", Sampling.splitColumn())
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(split.values.toSet.subsetOf(Set("train", "val", "test")))
    // stability: the assignment of a doc doesn't depend on which other docs
    // are present (growth never reshuffles eval membership)
    val half = docs.filter(col("doc_id") % 2 === 0)
      .withColumn("split", Sampling.splitColumn())
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(half.forall { case (id, s) => split(id) == s })
    // all three slices exist at corpus size
    assert(split.values.toSet == Set("train", "val", "test"))
  }

  test("epochSample: integer rates repeat exactly, fractional rates split by hash, rate<1 matches mixSample semantics") {
    val n = docs.count()
    // rate 2.0 exactly doubles every doc
    val twice = Sampling.epochSample(docs, Map.empty, defaultRate = 2.0)
    assert(twice.count() == 2 * n)
    assert(twice.groupBy("doc_id").count().filter(col("count") =!= 2).count() == 0)
    // rate 2.5: every doc 2 or 3 times; the 3-copy set is the hash-chosen half
    val twoAndHalf = Sampling.epochSample(docs, Map.empty, defaultRate = 2.5)
    val copies = twoAndHalf.groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(copies.values.forall(c => c == 2 || c == 3))
    assert(copies.values.exists(_ == 2) && copies.values.exists(_ == 3))
    // monotone: raising a rate only adds copies
    val three = Sampling.epochSample(docs, Map.empty, defaultRate = 3.0)
    assert(three.count() == 3 * n)
    // rate < 1 keeps a hash-chosen subset exactly once (mixSample semantics,
    // different salt)
    val half = Sampling.epochSample(docs, Map.empty, defaultRate = 0.5)
    assert(half.count() > 0 && half.count() < n)
    assert(half.groupBy("doc_id").count().filter(col("count") =!= 1).count() == 0)
    // determinism
    assert(Sampling.epochSample(docs, Map.empty, defaultRate = 0.5).count() == half.count())
  }

  test("packSequences: spans tile each doc exactly and fill every non-final sequence") {
    val L = 100L
    val spans = Sampling.packSequences(docs, L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val toks = docs.select(col("doc_id"),
        graft.functions.TextFunctions.tokenCount(col("text")).as("t"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // per-doc: spans are contiguous, non-overlapping, cover [0, toks), each <= L
    spans.groupBy(_._1).foreach { case (id, ss) =>
      val ordered = ss.sortBy(_._3)
      assert(ordered.head._4 == 0L, s"doc $id first span starts at 0")
      assert(ordered.last._5 == toks(id), s"doc $id last span ends at toks")
      assert(ordered.sliding(2).forall(p => p.size < 2 || p(0)._5 == p(1)._4),
        s"doc $id spans contiguous")
      assert(ordered.forall(s => s._5 - s._4 > 0 && s._5 - s._4 <= L))
    }
    // per-(source, seq): every sequence except a source's last holds exactly L tokens
    spans.groupBy(s => (s._2, s._3)).foreach { case ((src, seq), ss) =>
      val total = ss.map(s => s._5 - s._4).sum
      val lastSeq = spans.filter(_._2 == src).map(_._3).max
      if (seq < lastSeq) assert(total == L, s"($src, $seq) holds $total of $L")
      else assert(total <= L)
    }
  }

  test("packSequences is chunkWidth-invariant like packShards") {
    def seqs(w: Long): Set[(Long, Long, Long, Long)] =
      Sampling.packSequences(docs, 100L, chunkWidth = w)
        .select("doc_id", "seq", "tok_start", "tok_end").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val single = seqs(Long.MaxValue)
    assert(seqs(7L) == single)
    assert(seqs(64L) == single)
  }

  test("packShards: shard ids are contiguous from 0 and shards respect the budget") {
    val budget = 500L
    val packed = Sampling.packShards(docs, budget)
    val bySource = packed.groupBy("source", "shard")
      .agg(sum("toks").as("t"), max("toks").as("mx"))
      .collect()
    // every shard except possibly the last of a source holds <= budget + one doc overhang
    assert(bySource.forall(r => r.getLong(2) <= budget + r.getLong(3)))
    val shards = packed.filter(col("source") === allSources.head)
      .orderBy("doc_id").select("shard").collect().map(_.getLong(0)).toSeq
    assert(shards.head == 0L)
    assert(shards.sliding(2).forall(p => p.size < 2 || p(1) - p(0) <= 1 && p(1) >= p(0)))
  }
}
