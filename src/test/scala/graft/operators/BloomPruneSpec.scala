package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.expressions.Bloom

class BloomPruneSpec extends SparkSpec {
  import spark.implicits._

  test("kernel: no false negatives, ever") {
    val words = new Array[Long](Bloom.wordsFor(1000))
    val keys = (0L until 1000L).map(_ * 7919L - 350L)
    keys.foreach(Bloom.set(words, Bloom.defaultHashes, _))
    val blob = Bloom.serialize(words, Bloom.defaultHashes)
    assert(keys.forall(Bloom.mightContain(blob, _)))
  }

  test("kernel: false-positive rate near the 1% design point") {
    val words = new Array[Long](Bloom.wordsFor(1000))
    (0L until 1000L).foreach(k => Bloom.set(words, Bloom.defaultHashes, k))
    val blob = Bloom.serialize(words, Bloom.defaultHashes)
    // disjoint probe range
    val fps = (1000000L until 1010000L).count(Bloom.mightContain(blob, _))
    assert(fps < 300, s"fp rate ${fps / 10000.0} way above the 1% design point")
    assert(fps > 0, "a bloom filter with zero false positives at 10k probes is suspicious")
  }

  test("kernel: serialized header makes the blob self-describing") {
    val words = Array(0L, 0L)
    Bloom.set(words, 3, 42L)
    val (w2, k2) = Bloom.deserialize(Bloom.serialize(words, 3))
    assert(k2 === 3)
    assert(w2.toSeq === words.toSeq)
  }

  test("aggregate merges across partitions like a single-node build") {
    val keys = (0L until 500L).toDF("k").repartition(8)
    val blob = BloomPrune.buildFilter(keys, "k", expectedItems = 500)
    assert((0L until 500L).forall(Bloom.mightContain(blob, _)))
  }

  test("aggregate skips null keys") {
    val df = Seq[Option[Long]](Some(1L), None, Some(2L)).toDF("k")
    val blob = BloomPrune.buildFilter(df, "k", expectedItems = 16)
    assert(Bloom.mightContain(blob, 1L) && Bloom.mightContain(blob, 2L))
  }

  test("an empty dim yields an empty join, not an error — and prunes everything") {
    val fact = (0L until 100L).map(i => (i, i)).toDF("k", "v")
    val dim = Seq.empty[(Long, String)].toDF("k", "name")
    val blob = BloomPrune.buildFilter(dim, "k", expectedItems = 0)
    assert((0L until 100L).forall(!Bloom.mightContain(blob, _)))
    assert(BloomPrune.bloomPrunedJoin(fact, dim, "k", expectedItems = 0).count() === 0)
  }

  test("bloomPrunedJoin result is identical to the plain join") {
    val fact = (0L until 2000L).map(i => (i % 400L, i)).toDF("k", "v")
    val dim = (0L until 400L by 20L).map(k => (k, s"d$k")).toDF("k", "name")
    val pruned = BloomPrune.bloomPrunedJoin(fact, dim, "k", expectedItems = 20)
      .orderBy("k", "v").collect().toSeq
    val plain = fact.join(dim, Seq("k")).orderBy("k", "v").collect().toSeq
    assert(pruned === plain)
  }

  test("string keys route through xxhash64 and join identically to the plain join") {
    val fact = (0 until 2000).map(i => (s"key${i % 400}", i)).toDF("k", "v")
    val dim = (0 until 400 by 20).map(k => (s"key$k", s"d$k")).toDF("k", "name")
    val pruned = BloomPrune.bloomPrunedJoin(fact, dim, "k", expectedItems = 20)
      .orderBy("k", "v").collect().toSeq
    val plain = fact.join(dim, Seq("k")).orderBy("k", "v").collect().toSeq
    assert(pruned === plain && pruned.nonEmpty)
  }

  test("mismatched key types fail loudly instead of silently dropping rows") {
    val fact = (0 until 100).map(i => (i, i.toLong)).toDF("k", "v") // k: INT
    val dim = (0L until 100L by 10L).map(k => (k, s"d$k")).toDF("k", "name") // k: BIGINT
    val e = intercept[IllegalArgumentException] {
      BloomPrune.bloomPrunedJoin(fact, dim, "k", expectedItems = 10)
    }
    assert(e.getMessage.contains("cast both sides"))
  }

  test("malformed filter blobs raise a descriptive error, not IndexOutOfBounds") {
    val noHeader = intercept[IllegalArgumentException] {
      Bloom.mightContain(Array[Byte](1, 2, 3), 42L)
    }
    assert(noHeader.getMessage.contains("malformed bloom filter"))
    // header claims more words than the blob carries
    val bb = java.nio.ByteBuffer.allocate(16).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(7); bb.putInt(1000); bb.putLong(0L)
    val truncated = intercept[IllegalArgumentException] {
      Bloom.mightContain(bb.array(), 42L)
    }
    assert(truncated.getMessage.contains("numWords=1000"))
    // header claims an absurd hash count: must fail fast, not spin the
    // probe loop for 2^31 iterations per row
    val bh = java.nio.ByteBuffer.allocate(16).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bh.putInt(Int.MaxValue); bh.putInt(1); bh.putLong(-1L)
    val hashBomb = intercept[IllegalArgumentException] {
      Bloom.mightContain(bh.array(), 42L)
    }
    assert(hashBomb.getMessage.contains("numHashes"))
    // and through the SQL surface the error is equally diagnosable
    val sqlErr = intercept[Exception] {
      Seq(1L).toDF("k")
        .select(BloomPrune.mightContain(Array[Byte](9), col("k"))).collect()
    }
    assert(sqlErr.getMessage.contains("malformed bloom filter") ||
      Option(sqlErr.getCause).exists(_.getMessage.contains("malformed bloom filter")))
  }

  test("the prefilter actually prunes: surviving fact rows ≈ matching + fp") {
    val fact = (0L until 10000L).map(i => (i % 1000L, i)).toDF("k", "v")
    val dim = (0L until 1000L by 100L).map(k => (k, s"d$k")).toDF("k", "name")
    val blob = BloomPrune.buildFilter(dim, "k", expectedItems = 10)
    val survivors = fact.filter(BloomPrune.mightContain(blob, col("k"))).count()
    // 10 of 1000 keys match -> 100 true rows; leave generous fp headroom
    assert(survivors >= 100 && survivors < 400,
      s"expected ~100 surviving rows (plus small fp), got $survivors")
  }
}
