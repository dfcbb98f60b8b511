package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Training-mixture construction operators: deterministic per-source
  * sampling and token-budget shard packing.
  */
object Sampling {

  /** 2^60 — the sampling hash space (60 bits keeps the threshold compare in
    * signed-long range, same convention as the dedup hashes).
    */
  val hashSpace: Double = (1L << 60).toDouble

  /** Deterministic mixture sampling: keep a doc iff its salted 60-bit md5
    * falls below `rate(source) × 2^60`. Properties that matter for training
    * dumps at scale:
    *  - stateless filter — no shuffle, no RNG seed plumbing, fully parallel;
    *  - reproducible — the same doc set survives on every run and engine;
    *  - stable under rate changes — raising a source's rate only ADDS docs
    *    (hashes don't move), so incremental dumps stay supersets.
    * The rate table rides a broadcast left join; unlisted sources fall back
    * to `defaultRate`.
    */
  def mixSample(docs: DataFrame, rates: Map[String, Double], defaultRate: Double = 0.0,
                idCol: String = "doc_id", sourceCol: String = "source"): DataFrame = {
    val ratesDf = docs.sparkSession
      .createDataFrame(rates.toSeq.sorted).toDF(sourceCol, "rate")
    docs.join(broadcast(ratesDf), Seq(sourceCol), "left")
      .withColumn("u",
        conv(substring(md5(concat(col(idCol).cast("string"), lit("#mix"))), 1, 15), 16, 10)
          .cast("long"))
      .filter(col("u") < (coalesce(col("rate"), lit(defaultRate)) * hashSpace).cast("long"))
      .drop("u", "rate")
  }

  /** TEMPERATURE-flattened mixture sampling (the T5/"sampling temperature"
    * recipe): per-source keep rates are derived from the corpus itself —
    * source s with n_s docs gets probability mass ∝ n_s^alpha, so alpha=1
    * reproduces natural proportions, alpha=0 samples sources uniformly, and
    * the usual 0<alpha<1 up-weights small high-value sources without a
    * hand-written rate table. `targetFrac` sets the overall sample size as a
    * fraction of the corpus; per-source rates cap at 1 (no up-sampling —
    * compose with epochSample for that).
    *
    * Determinism across engines: the only cross-source reduction (the
    * weight-sum denominator) is an exact DECIMAL sum of 6-rounded weights,
    * and each rate is rounded to 6 before the coin compare, so the oracle
    * computes bit-identical thresholds. Scale shape: one partial-aggregable
    * count per source, one single-row broadcast, then the same stateless
    * coin filter as [[mixSample]] — no shuffle touches the corpus.
    */
  def temperatureSample(docs: DataFrame, alpha: Double, targetFrac: Double,
                        idCol: String = "doc_id", sourceCol: String = "source"): DataFrame = {
    val w6 = round(pow(col("n").cast("double"), alpha), 6)
    val counts = docs.groupBy(sourceCol).agg(count(lit(1)).as("n"))
    val tot = counts.agg(
      sum(w6.cast("decimal(28,6)")).as("wsum"), sum(col("n")).as("ntot"))
    val rates = counts.crossJoin(broadcast(tot))
      .select(col(sourceCol),
        least(lit(1.0),
          round(lit(targetFrac) * (w6 / col("wsum").cast("double")) *
            col("ntot") / col("n"), 6)).as("rate"))
    docs.join(broadcast(rates), Seq(sourceCol))
      .withColumn("u",
        conv(substring(md5(concat(col(idCol).cast("string"), lit("#temp"))), 1, 15), 16, 10)
          .cast("long"))
      .filter(col("u") < (col("rate") * hashSpace).cast("long"))
      .drop("u", "rate")
  }

  /** Per-document WEIGHTED sampling: keep a doc iff its salted 60-bit md5
    * falls below `weight × 2^60`, where `weight ∈ [0,1]` is any per-row
    * column (typically a quality score — high-quality docs survive at their
    * weight, junk at its). The per-source [[mixSample]] generalized to
    * row-level rates, with the same scale properties: a stateless filter
    * (no shuffle, no RNG state), reproducible across runs and engines, and
    * monotone — raising a doc's weight can only keep it, never drop it.
    * The threshold is truncated to a long so both engines compare integers
    * (DuckDB's double→int cast rounds; trunc matches Spark's cast).
    */
  def weightedSample(docs: DataFrame, weight: org.apache.spark.sql.Column,
                     idCol: String = "doc_id"): DataFrame =
    docs.filter(
      conv(substring(md5(concat(col(idCol).cast("string"), lit("#wmix"))), 1, 15), 16, 10)
        .cast("long") < (weight * hashSpace).cast("long"))

  /** Deterministic EPOCH sampling — [[mixSample]] generalized to rates above
    * 1: a source with rate 2.5 repeats every doc twice and a salted-hash
    * half of them a third time, so the output materializes the per-source
    * epoch counts a training mixture prescribes ("web 0.5 epochs, curated
    * 3 epochs"). Each doc yields `floor(rate)` copies plus one more iff its
    * salted 60-bit hash clears the fractional part — so rates < 1 degrade
    * to [[mixSample]]-STYLE keep/drop semantics (0 or 1 copies at the same
    * keep-probability; a DIFFERENT salt, so the kept set is an independent
    * draw, not mixSample's — migrate rates, not membership expectations),
    * and keeps all of its scale properties: stateless scan filter + bounded
    * `sequence()` explode (fan-out = rate), no shuffle, reproducible, and
    * monotone — raising a rate only ADDS copies. Output carries the copy
    * index as `epoch` (1-based) so downstream shuffling can interleave
    * epochs deterministically.
    */
  def epochSample(docs: DataFrame, rates: Map[String, Double], defaultRate: Double = 1.0,
                  idCol: String = "doc_id", sourceCol: String = "source"): DataFrame = {
    val ratesDf = docs.sparkSession
      .createDataFrame(rates.toSeq.sorted).toDF(sourceCol, "rate")
    docs.join(broadcast(ratesDf), Seq(sourceCol), "left")
      .withColumn("rate", coalesce(col("rate"), lit(defaultRate)))
      .withColumn("base", floor(col("rate")).cast("long"))
      .withColumn("u",
        conv(substring(md5(concat(col(idCol).cast("string"), lit("#epoch"))), 1, 15), 16, 10)
          .cast("long"))
      .withColumn("n", col("base") +
        when(col("u") < ((col("rate") - col("base")) * hashSpace).cast("long"), 1L)
          .otherwise(0L))
      .filter(col("n") >= 1)
      .select(col(idCol), col(sourceCol),
        explode(sequence(lit(1L), col("n"))).as("epoch"))
  }

  /** Deterministic train/val/test split assignment: a salted 60-bit md5 of
    * the id, reduced mod 100, buckets each doc into `test` (< testPct),
    * `val` (< testPct+valPct) or `train`. Same scale properties as
    * [[mixSample]] — stateless, shuffle-free, reproducible on any engine,
    * and stable: a doc's split never changes as the corpus grows, so eval
    * sets stay uncontaminated across dumps.
    */
  def splitColumn(idCol: String = "doc_id", testPct: Int = 2, valPct: Int = 10): org.apache.spark.sql.Column = {
    val u = conv(substring(md5(concat(col(idCol).cast("string"), lit("#split"))), 1, 15), 16, 10)
      .cast("long") % 100
    when(u < testPct, lit("test"))
      .when(u < testPct + valPct, lit("val"))
      .otherwise(lit("train"))
  }

  /** Token-budget shard packing: within each source (ordered by id), docs
    * accumulate into shards of ~`tokensPerShard` via a running token sum —
    * shard = previous cumulative tokens div budget.
    *
    * TWO-LEVEL structure, because a single `Window.partitionBy(source)`
    * caps parallelism at the source COUNT (~20 sources ⇒ ≤20 tasks, and one
    * hot source serializes half the corpus into one window partition):
    *  1. rows are sliced into fixed-width id ranges (`chunk = id div
    *     chunkWidth`); the running sum windows over (source, chunk) — many
    *     partitions per source, each bounded by chunkWidth rows;
    *  2. per-(source, chunk) token totals get a second running sum over the
    *     CHUNK rows only (an n/chunkWidth-row frame: ~1M rows for 10^12 docs
    *     at the default width — a side Spark can and will broadcast, but the
    *     join is left unhinted so the planner degrades to a shuffle join
    *     rather than failing if a caller shrinks chunkWidth at huge n);
    *  3. offsets join back onto the local sums: cum = offset + local.
    * Since `chunk` is monotone in id, (chunk, id) order ≡ id order and the
    * cumulative values — hence shard assignments and the oracle — are
    * IDENTICAL to the single-window form at any chunkWidth. Integral `div`
    * keeps both engines exact.
    */
  def packShards(docs: DataFrame, tokensPerShard: Long,
                 idCol: String = "doc_id", sourceCol: String = "source",
                 textCol: String = "text", chunkWidth: Long = 1L << 20): DataFrame =
    cumulativeTokens(docs, idCol, sourceCol, textCol, chunkWidth)
      .select(col(idCol), col(sourceCol), col("toks"),
        expr(s"(cum - toks) div $tokensPerShard").as("shard"))

  /** The shared running-token-sum backbone of [[packShards]] and
    * [[packSequences]]: per (source, doc-id order), each doc's token count
    * plus its INCLUSIVE cumulative sum `cum` within the source's token
    * stream. Carries the two-level (source, id-chunk) window structure, so
    * the values are identical to a single source-window at any chunkWidth
    * while parallelism scales with chunk count.
    */
  private def cumulativeTokens(docs: DataFrame, idCol: String, sourceCol: String,
                               textCol: String, chunkWidth: Long): DataFrame =
    withCumulative(
      docs.withColumn("toks", TextFunctions.tokenCount(col(textCol))),
      idCol, sourceCol, chunkWidth)
      .select(col(idCol), col(sourceCol), col("toks"), col("cum"))

  /** The two-level running-sum backbone over an EXISTING `toks` column:
    * returns `rows` plus the inclusive per-source cumulative sum `cum` (in
    * `idCol` order), preserving every other input column. Callers that
    * count tokens differently from the whitespace default — e.g. the
    * tokenizer pipeline, whose unit is vocabulary ids — share the exact
    * same chunked-window scale shape this way.
    */
  private[graft] def withCumulative(rows: DataFrame, idCol: String, sourceCol: String,
                                    chunkWidth: Long): DataFrame = {
    val chunked = rows.withColumn("chunk", expr(s"$idCol div $chunkWidth"))
    val wLocal = Window.partitionBy(sourceCol, "chunk").orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wOffset = Window.partitionBy(sourceCol).orderBy("chunk")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = chunked.groupBy(col(sourceCol), col("chunk"))
      .agg(sum("toks").as("ctoks"))
      .select(col(sourceCol), col("chunk"),
        coalesce(sum("ctoks").over(wOffset), lit(0L)).as("off"))
    chunked.withColumn("lcum", sum("toks").over(wLocal))
      .join(offsets, Seq(sourceCol, "chunk"))
      .withColumn("cum", col("off") + col("lcum"))
      .drop("chunk", "lcum", "off")
  }

  /** Fixed-length training-sequence packing: each source's docs lay out
    * contiguously (doc-id order) in a token stream sliced into sequences of
    * exactly `seqLen` tokens; a doc spanning a boundary SPLITS — one output
    * row per (doc, sequence) overlap with the doc-local half-open token range
    * `[tok_start, tok_end)` that lands in that sequence. This is the LLM
    * pre-training layout step ([[packShards]] assigns whole docs to shard
    * FILES; this packs tokens into model-context windows, spilling across
    * them), computed without materializing a single token row:
    *  - the running offset rides the same two-level window backbone;
    *  - the per-doc fan-out is `sequence(first_seq, last_seq)` — at most
    *    `toks/seqLen + 1` rows per doc, so the explode output is ~n_tokens/
    *    seqLen extra rows corpus-wide, never tokens;
    *  - everything after the window is scan-local arithmetic (codegen).
    */
  def packSequences(docs: DataFrame, seqLen: Long,
                    idCol: String = "doc_id", sourceCol: String = "source",
                    textCol: String = "text", chunkWidth: Long = 1L << 20): DataFrame =
    cumulativeTokens(docs, idCol, sourceCol, textCol, chunkWidth)
      .withColumn("start", col("cum") - col("toks"))
      .withColumn("seq", explode(sequence(expr(s"start div $seqLen"), expr(s"(cum - 1) div $seqLen"))))
      .select(col(idCol), col(sourceCol), col("seq"),
        (greatest(col("seq") * seqLen, col("start")) - col("start")).as("tok_start"),
        (least((col("seq") + 1) * seqLen, col("cum")) - col("start")).as("tok_end"))
}
