package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Behavior pins for the tokenizer-facing text queries (PMI collocations,
  * OOV rate, the Gopher-rule gate) — the oracle hash-checks exact values;
  * these pin the semantic invariants a refactor must preserve.
  */
class TextQueriesSpec extends SparkSpec {

  test("BPE merges follow the textbook greedy on a hand-checked corpus") {
    import spark.implicits._
    // one doc: words aaaa ×2, abab ×1. Hand trace:
    //   m1: (a,a) ×3 in each aaaa → 6; merging 'aaaa' gives 'aa aa' (the
    //       left-to-right non-overlap — standard BPE greedy)
    //   m2: tie (a,b)=2 vs (aa,aa)=2 breaks on left symbol: 'a' < 'aa'
    //   m3: (aa,aa)=2 → aaaa      m4: (ab,ab)=1 → abab
    //   m5..8: no pairs remain — rounds emit nothing instead of throwing
    val dir = java.nio.file.Files.createTempDirectory("graft_bpe").toString
    Seq((0L, "aaaa aaaa abab", "en", "src0", 14L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextQueries.bpe(spark, dir).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
    assert(got.toSeq == Seq(
      (1, "a", "a", "aa", 6L),
      (2, "a", "b", "ab", 2L),
      (3, "aa", "aa", "aaaa", 2L),
      (4, "ab", "ab", "abab", 1L)))
  }

  test("token ids: decoding through the vocab reproduces the in-vocab token stream") {
    val vocabMap = TextQueries.vocab(spark, sf0001)
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    val ids = TextQueries.tokenIdsArray(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val docs = graft.Tables.documents(spark, sf0001).filter(col("doc_id") < 20)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(ids.size === docs.size)
    // the declared-query face serializes the same stream, space-joined
    val serialized = TextQueries.tokenIds(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(serialized === ids.map { case (d, xs) => d -> xs.mkString(" ") })
    docs.foreach { case (d, text) =>
      val toks = text.toLowerCase.split(" ").filter(_.nonEmpty).toSeq
      val got = ids(d)
      assert(got.length === toks.length, s"doc $d length")
      got.zip(toks).foreach { case (id, tok) =>
        if (id == 0) assert(!vocabMap.values.toSet.contains(tok) || vocabMap.valuesIterator.isEmpty,
          s"doc $d: token '$tok' is in vocab but got OOV id")
        else assert(vocabMap(id) === tok, s"doc $d: id $id decodes to ${vocabMap(id)}, not $tok")
      }
    }
  }

  test("PMI: min-count floor holds and the score matches a hand recomputation") {
    val rows = TextQueries.pmi(spark, sf0001).collect()
    assert(rows.nonEmpty && rows.length <= TextQueries.pmiTopN)
    rows.foreach(r => assert(r.getLong(2) >= TextQueries.pmiMinCount))
    // recompute the top pair's PMI from raw counts
    val (w1, w2, c, pmi) =
      (rows.head.getString(0), rows.head.getString(1), rows.head.getLong(2), rows.head.getDouble(3))
    val toks = graft.Tables.documents(spark, sf0001)
      .select(explode(split(lower(col("text")), " ")).as("w")).filter(col("w") =!= "")
    val t = toks.count().toDouble
    val c1 = toks.filter(col("w") === w1).count().toDouble
    val c2 = toks.filter(col("w") === w2).count().toDouble
    val b = graft.Tables.documents(spark, sf0001)
      .select(size(split(lower(col("text")), " ")).as("n"))
      .agg(sum(col("n") - 1)).head().getLong(0).toDouble // bigrams incl. '' pairs? none in corpus
    val expected = math.log(c * t * t / (b * c1 * c2))
    assert(math.abs(pmi - BigDecimal(expected).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 2e-6,
      s"pmi($w1,$w2)=$pmi expected ~$expected")
  }

  test("OOV: rate bounded, oov <= toks, and an all-vocab doc scores 0") {
    val rows = TextQueries.oov(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (toks, oov, rate) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(oov >= 0 && oov <= toks)
      assert(rate >= 0.0 && rate <= 1.0)
      assert(math.abs(rate - BigDecimal(oov.toDouble / toks)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 2e-6)
    }
    // the synthetic corpus draws from a tiny vocabulary, so with vocabSize
    // 200 every token is in-vocab and the whole column must be 0 — a loud
    // canary if the vocab/oov tokenizations ever drift apart
    assert(rows.forall(_.getLong(2) == 0L))
  }

  test("bigram LM: one score per scorable doc, strictly negative (smoothed probs < 1), deterministic") {
    val rows = TextQueries.bigramLm(spark, sf0001).collect()
    val expect = graft.Tables.documents(spark, sf0001)
      .filter(col("doc_id") < 200 && size(split(lower(col("text")), " ")) >= 2)
      .count()
    assert(rows.length == expect)
    rows.foreach { r =>
      val lp = r.getDouble(1)
      assert(!lp.isNaN && !lp.isInfinite && lp < 0.0, s"doc ${r.getLong(0)} lp=$lp")
    }
    val again = TextQueries.bigramLm(spark, sf0001).collect()
    assert(rows.map(r => (r.getLong(0), r.getDouble(1))).toSeq ==
      again.map(r => (r.getLong(0), r.getDouble(1))).toSeq)
  }

  test("chunking: windows cover every token, obey the stride/overlap geometry, and carry the right text") {
    val (w, s) = (TextQueries.chunkToks, TextQueries.chunkStride)
    val rows = TextQueries.chunks(spark, sf0001).collect()
    val docs = graft.Tables.documents(spark, sf0001)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.groupBy(_.getLong(0)).foreach { case (id, cs) =>
      val toks = docs(id).split(" ", -1)
      val ordered = cs.sortBy(_.getLong(1))
      // geometry: chunk i starts at i*stride; last ends at the doc end
      ordered.foreach { r =>
        assert(r.getLong(2) == r.getLong(1) * s)
        assert(r.getLong(3) == math.min(r.getLong(1) * s + w, toks.length))
        assert(r.getLong(3) > r.getLong(2))
      }
      assert(ordered.last.getLong(3) == toks.length)
      // every token index is inside at least one chunk
      val covered = ordered.flatMap(r => r.getLong(2) until r.getLong(3)).toSet
      assert(covered == toks.indices.map(_.toLong).toSet, s"doc $id coverage")
      // the text is the actual token slice
      ordered.foreach { r =>
        val expect = toks.slice(r.getLong(2).toInt, r.getLong(3).toInt).mkString(" ")
        assert(r.getString(4) == expect, s"doc $id chunk ${r.getLong(1)}")
      }
    }
  }

  test("Gopher gate: pass counts bounded by docs, kept is the conjunction's lower envelope") {
    val rows = TextQueries.gopher(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val docs = r.getLong(1)
      val passes = (2 to 6).map(r.getLong)
      val kept = r.getLong(7)
      passes.foreach(p => assert(p >= 0 && p <= docs))
      assert(kept <= passes.min)
    }
    // rules are non-degenerate at corpus scale: the gate keeps some docs and
    // at least one rule actually rejects something
    val totalDocs = rows.map(_.getLong(1)).sum
    val totalKept = rows.map(_.getLong(7)).sum
    assert(totalKept > 0 && totalKept < totalDocs)
  }

  test("rake == a sequential reimplementation of degree/frequency scoring") {
    val stop = graft.functions.TextFunctions.stopwords("en").toSet
    val docs = graft.Tables.documents(spark, sf0001)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    // phrases: maximal runs of consecutive non-empty non-stopword tokens
    // over RAW split positions (double spaces break runs, like the query)
    val phrases = docs.flatMap { case (_, text) =>
      val toks = text.toLowerCase.split(" ", -1).zipWithIndex
        .filter { case (w, _) => w.nonEmpty && !stop(w) }
      val runs = scala.collection.mutable.ArrayBuffer.empty[Vector[String]]
      toks.zipWithIndex.foreach { case ((w, pos), k) =>
        if (k == 0 || toks(k - 1)._2 != pos - 1) runs += Vector(w)
        else runs(runs.size - 1) = runs.last :+ w
      }
      runs.toSeq
    }
    val freq = phrases.flatten.groupBy(identity).view.mapValues(_.size.toLong)
    val deg = phrases.flatMap(p => p.map(_ -> p.size.toLong))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum)
    val scoreU = freq.keys.map(w => w -> deg(w) * 1000000L / freq(w)).toMap
    val want = phrases.map(p => p.mkString(" ") -> p.map(scoreU).sum)
      .groupBy(_._1).map { case (ph, occ) => (ph, occ.size.toLong, occ.head._2) }
      .toSeq
      .sortBy { case (ph, _, su) => (-su, ph) }.take(25)
      .map { case (ph, n, su) => (ph, n,
        BigDecimal(su / 1000000.0).setScale(6, BigDecimal.RoundingMode.HALF_UP)
          .toDouble) }
    val got = TextQueries.rake(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == want)
  }

  test("BPE apply round-trips training: tokens re-concatenate to the text, merges fire") {
    import org.apache.spark.sql.functions._
    // apply(train(corpus)) on the training corpus itself: every doc's token
    // sequence must re-concatenate to its lowercased text minus spaces
    // (merges change segmentation, never content, and never cross a word
    // boundary thanks to the 4-space run between word states)
    val bad = TextQueries.bpeTokens(spark, sf0001)
      .join(graft.Tables.documents(spark, sf0001), "doc_id")
      .select(
        expr("array_join(syms, '')").as("joined"),
        regexp_replace(lower(col("text")), " ", "").as("want"),
        size(col("syms")).as("n"),
        length(regexp_replace(lower(col("text")), " ", "")).as("chars"))
    assert(bad.filter(col("joined") =!= col("want")).count() == 0)
    // the trained merges actually fire: total tokens < total chars
    val agg = bad.agg(sum("n"), sum("chars")).head()
    assert(agg.getLong(0) < agg.getLong(1),
      s"no merge applied: ${agg.getLong(0)} tokens vs ${agg.getLong(1)} chars")
    // and the declared surface is consistent: n_tokens matches the token
    // frame, first ids resolve in the vocab (non-null where pos exists)
    val applied = TextQueries.bpeApply(spark, sf0001)
    assert(applied.filter(col("n_tokens") > 0 && col("id0").isNull).count() == 0)
  }
}
