package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-style importance weighting (Xie et al. 2023, "Data Selection for
  * Language Models via Importance Resampling"): score every document by how
  * much more likely its hashed-n-gram profile is under a TARGET domain's
  * unigram bucket distribution than under the raw corpus's — the standard
  * cheap way to pull "looks like my high-quality domain" data out of a web
  * crawl without training a classifier.
  *
  * Features are word unigrams + adjacent bigrams hashed into [[defaultBuckets]]
  * buckets (the paper's hashed n-gram featurization); both distributions get
  * add-one smoothing; a doc's log importance weight is
  * `Σ_b count_d(b)·(ln p_target(b) − ln q_corpus(b))`.
  *
  * Scale shape: gram extraction is scan-local (array ops + one bounded
  * explode, ~2 rows per token); per-doc and per-bucket counts are
  * partial-aggregable groupBys; the log-ratio table is ≤ `buckets` rows and
  * rides a BROADCAST join back over the per-doc features — at 100 TB the
  * whole operator is one explode-scan plus thin aggregates, the same budget
  * as [[graft.queries.TextQueries.lmScore]]. Per-doc accumulation is
  * sort-then-sum so double addition is engine-order-independent.
  *
  * Deterministic selection: rank by (rounded weight, doc_id) — the
  * deterministic stand-in for the paper's Gumbel-top-k resampling, same
  * replacement the mixture sampler makes for Bernoulli draws.
  */
object Importance {

  /** Hashed feature-space size. 128 keeps the log-ratio table broadcast-tiny
    * while leaving collisions rare enough to discriminate at test scale;
    * production would raise it (the paper uses 10k) — every shape below is
    * independent of the constant.
    */
  val defaultBuckets = 128

  /** Per-occurrence hashed gram buckets: one row per unigram AND per
    * adjacent bigram, bucketed by the same md5-prefix hash family the
    * MinHash signatures use (mirrored literally by the DuckDB oracle).
    * Output: (doc_id, plus `carry` columns, b).
    */
  def hashedGramBuckets(docs: DataFrame, buckets: Int = defaultBuckets,
                        carry: Seq[String] = Nil): DataFrame = {
    val w = filter(split(lower(col("text")), " "), t => t =!= "")
    val bigrams = when(size(col("w")) >= 2,
      transform(sequence(lit(1), size(col("w")) - 1),
        i => concat(element_at(col("w"), i), lit(" "), element_at(col("w"), i + 1))))
      .otherwise(array().cast("array<string>"))
    docs.select(col("doc_id") +: carry.map(col) :+ w.as("w"): _*)
      .select(col("doc_id") +: carry.map(col) :+
        explode(concat(col("w"), bigrams)).as("gram"): _*)
      .select(col("doc_id") +: carry.map(col) :+
        (conv(substring(md5(col("gram")), 1, 15), 16, 10).cast("long") % buckets).as("b"): _*)
  }

  /** Per-doc DSIR log importance weights against the docs matching
    * `isTarget`. Returns (doc_id, dsir_w ROUNDED to 6dp) for every doc.
    */
  def dsirWeights(docs: DataFrame, isTarget: Column,
                  buckets: Int = defaultBuckets): DataFrame = {
    val grams = hashedGramBuckets(docs.withColumn("tgt", isTarget), buckets,
      carry = Seq("tgt"))
    // ONE pass over the gram explode: per-(doc, bucket) counts carry the
    // doc-constant target flag, and every corpus-level number derives from
    // this frame instead of re-exploding the corpus (bucket counts roll up
    // from ≤ docs × buckets rows; the two scalar totals from ≤ buckets
    // rows). The frame is staged eagerly (the dedup shingle pattern) so its
    // three consumers scan the staged rows instead of re-running the
    // explode + aggregation per subtree.
    val feat = grams.groupBy("doc_id", "b")
      .agg(count(lit(1)).as("c"), first(col("tgt")).as("tgt"))
      .localCheckpoint()
    val bc = feat.groupBy("b").agg(
      sum("c").as("qc"),
      coalesce(sum(when(col("tgt"), col("c"))), lit(0L)).as("tc"))
    val tot = bc.agg(
      sum("qc").cast("double").as("qt"),
      sum("tc").cast("double").as("tt"))
    val lr = bc.crossJoin(tot)
      .select(col("b"),
        (log((col("tc") + 1) / (col("tt") + buckets)) -
         log((col("qc") + 1) / (col("qt") + buckets))).as("lr"))
    feat.join(broadcast(lr), "b")
      .select(col("doc_id"), (col("c") * col("lr")).as("term"))
      .groupBy("doc_id")
      .agg(round(
        expr("aggregate(array_sort(collect_list(term)), CAST(0.0 AS DOUBLE), (a, x) -> a + x)"),
        6).as("dsir_w"))
  }

  /** Per-source distribution drift vs the whole corpus over the hashed gram
    * buckets: add-one-smoothed KL(source ‖ corpus) and the symmetric,
    * bounded Jensen-Shannon divergence — the "which source shifted under
    * me" monitor between ingests (PSI's cousin with information-theoretic
    * units; PSI is `curate_drift`).
    *
    * Scale shape: one gram explode (scan-local hashing) → per-(source,
    * bucket) partial-aggregable counts; everything after operates on
    * ≤ sources × buckets rows. The per-source reduction over the bucket
    * grid is a sorted fold (identical in the oracle), so the double sums
    * are engine-reproducible. Zero-count buckets still contribute their
    * smoothed mass — the grid is completed by a broadcast bucket range, not
    * by trusting the data to hit every bucket.
    */
  def klDrift(docs: DataFrame, buckets: Int = defaultBuckets): DataFrame = {
    val sc = hashedGramBuckets(docs, buckets, carry = Seq("source"))
      .groupBy("source", "b").agg(count(lit(1)).as("c"))
      .localCheckpoint()
    val qb = sc.groupBy("b").agg(sum("c").as("q"))
    val ns = sc.groupBy("source").agg(sum("c").as("n"))
    val tot = qb.agg(sum("q").cast("double").as("nn"))
    val bucketIds = docs.sparkSession.range(buckets).select(col("id").as("b"))
    val terms = ns.crossJoin(broadcast(bucketIds))
      .join(sc, Seq("source", "b"), "left")
      .join(broadcast(qb), Seq("b"), "left")
      .crossJoin(broadcast(tot))
      .select(col("source"),
        ((coalesce(col("c"), lit(0L)) + 1) / (col("n") + lit(buckets))).as("ps"),
        ((coalesce(col("q"), lit(0L)) + 1) / (col("nn") + lit(buckets))).as("pc"))
    val m = (col("ps") + col("pc")) / 2
    terms
      .select(col("source"),
        (col("ps") * log(col("ps") / col("pc"))).as("klt"),
        (lit(0.5) * (col("ps") * log(col("ps") / m) +
          col("pc") * log(col("pc") / m))).as("jst"))
      .groupBy("source")
      .agg(
        round(expr("aggregate(array_sort(collect_list(klt)), CAST(0.0 AS DOUBLE), (a, x) -> a + x)"), 6).as("kl"),
        round(expr("aggregate(array_sort(collect_list(jst)), CAST(0.0 AS DOUBLE), (a, x) -> a + x)"), 6).as("js"))
  }

  /** Top-`n` docs by DSIR weight — deterministic importance "resampling". */
  def dsirSelect(docs: DataFrame, isTarget: Column, n: Int,
                 buckets: Int = defaultBuckets): DataFrame =
    dsirWeights(docs, isTarget, buckets)
      .orderBy(desc("dsir_w"), asc("doc_id"))
      .limit(n)
}
