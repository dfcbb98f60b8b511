package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ImportanceSpec extends SparkSpec {
  import spark.implicits._

  private def weights(rows: Seq[(Long, String, String)]): Map[Long, Double] = {
    val docs = rows.toDF("doc_id", "text", "lang")
    Importance.dsirWeights(docs, col("lang") === "en")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
  }

  test("docs sharing the target vocabulary outrank docs that don't") {
    val w = weights(Seq(
      (0L, "alpha beta gamma alpha beta", "en"),
      (1L, "beta gamma alpha beta gamma", "en"),
      (2L, "zug bahn hof zug bahn", "de"),
      (3L, "hof zug bahn hof bahn", "de"),
      // unlabeled probes: one looks like the target, one like the distractor
      (10L, "alpha gamma beta alpha", "zh"),
      (11L, "bahn hof zug bahn", "zh")))
    assert(w(10L) > w(11L),
      s"target-vocab probe ${w(10L)} should outrank distractor-vocab probe ${w(11L)}")
    assert(w(0L) > w(2L))
  }

  test("bigram features see word ORDER, not just the bag of words") {
    // target repeats the bigram "alpha beta"; both probes share identical
    // unigram counts and differ only in adjacency
    val w = weights(Seq(
      (0L, "alpha beta alpha beta alpha beta", "en"),
      (1L, "alpha beta gamma alpha beta", "en"),
      (2L, "delta epsilon delta epsilon", "de"),
      (10L, "alpha beta alpha beta", "zh"),
      (11L, "beta alpha beta alpha", "zh")))
    assert(w(10L) > w(11L),
      s"in-order probe ${w(10L)} should beat scrambled probe ${w(11L)}")
  }

  test("degenerate docs survive: empty text and single tokens") {
    val docs = Seq(
      (0L, "alpha beta", "en"),
      (1L, "", "de"),
      (2L, "solo", "de")).toDF("doc_id", "text", "lang")
    val w = Importance.dsirWeights(docs, col("lang") === "en")
      .collect().map(_.getLong(0)).toSet
    // the empty doc emits no grams and so has no weight row; solo has one
    assert(w === Set(0L, 2L))
  }

  test("dsirSelect returns exactly n rows in weight-desc order") {
    val docs = (0L until 40L).map { i =>
      (i, if (i % 2 == 0) "alpha beta gamma" else "zug bahn hof",
        if (i < 10 && i % 2 == 0) "en" else "zh")
    }.toDF("doc_id", "text", "lang")
    val got = Importance.dsirSelect(docs, col("lang") === "en", n = 5).collect()
    assert(got.length === 5)
    val ws = got.map(_.getDouble(1)).toSeq
    assert(ws === ws.sorted(Ordering[Double].reverse))
    // every selected doc is from the target-looking half
    assert(got.map(_.getLong(0)).forall(_ % 2 == 0))
  }
}
