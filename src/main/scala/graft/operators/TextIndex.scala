package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Staged inverted LEXICAL index — the text twin of the staged ANN tables
  * (`Similarity.stageLshBucketed`): postings `(w, doc_id, tf, dl)` staged
  * BUCKETED BY TERM, so a query whose terms arrive as literals reads only
  * the buckets those terms hash to (`SelectedBucketsCount` pruning,
  * plan-audited) instead of re-exploding the corpus per query — serving-path
  * I/O ∝ postings of the queried terms, not corpus size.
  *
  * What is stored deliberately excludes every corpus-level number that an
  * append would invalidate EXCEPT the two scalars:
  *  - `df` is NOT stored — it is recomputed at probe time from the pruned
  *    postings themselves (df(w) = posting count of w, and a probe has to
  *    read all of w's postings to rank anyway, so this is free);
  *  - the `(n, total_dl)` EXACT integer pair lives in a LEDGER sidecar
  *    table — one row per staged/appended batch, readers SUM the rows — so
  *    `avgdl = total_dl/n` stays exact (no drifting floating-point average)
  *    and an append never read-modify-rewrites existing stats.
  * Hence [[appendToIndex]] is correct without rewriting a single existing
  * posting: per-batch cost ∝ batch size (the dedup-staging property), with
  * the same new-docs-only contract as `Similarity.appendStagedLsh`.
  *
  * Write-path contract: appends assume a SINGLE WRITER per index (the same
  * assumption every staged table here makes — there is no transactional
  * catalog underneath). Within one append the postings land first and the
  * stats row second; a crash between the two leaves the ledger missing one
  * batch's pair, which skews idf/avgdl slightly but never loses postings —
  * [[recomputeStats]] rebuilds the exact ledger from the postings table and
  * is the recovery tool for a torn append.
  *
  * BM25 scoring at probe time reproduces `TextQueries.bm25Scores`
  * arithmetic exactly (same expression shape, same constants); per-doc
  * accumulation is sort-then-sum so the DuckDB oracle folds identically.
  */
object TextIndex {

  /** One row per (doc, token) occurrence — the shared tokenization. */
  private def tokenize(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(split(lower(col("text")), " ")).as("w"))
      .filter(col("w") =!= "")

  /** Postings for a doc set: (w, doc_id, tf, dl).
    *
    * ONE tokenize pass (r17, guide §2.4): `dl = Σ_w tf(doc, w)` rides a
    * doc-keyed window over the aggregated postings — the previous
    * `tf ⋈ (toks.groupBy(doc_id).count)` shape re-tokenized the whole
    * corpus for the doc lengths and paid a join exchange to attach them.
    * Identical rows by construction (a doc's token count IS the sum of its
    * per-term counts).
    */
  private[graft] def buildPostings(docs: DataFrame): DataFrame =
    tokenize(docs).groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))
      .withColumn("dl", sum("tf").over(
        org.apache.spark.sql.expressions.Window.partitionBy("doc_id")))
      .select("w", "doc_id", "tf", "dl")

  private def statsTable(table: String) = s"${table}_stats"

  // INVARIANT: docs whose text tokenizes to zero tokens are excluded from
  // `n` (they drop out of the groupBy below, and contribute no postings, so
  // recomputeStats excludes them identically). BM25 never scores an empty
  // doc, so excluding them from avgdl's denominator is the right semantics —
  // but both paths MUST keep agreeing; TextIndexSpec pins this with an
  // empty-text doc.
  private def batchStats(docs: DataFrame): (Long, Long) = {
    val r = tokenize(docs).groupBy("doc_id").agg(count(lit(1)).as("dl"))
      .agg(count(lit(1)), coalesce(sum("dl"), lit(0L))).head()
    (r.getLong(0), r.getLong(1))
  }

  /** Build the index over `docs`: postings bucketed+sorted by term plus the
    * one-row exact stats sidecar. Idempotent (replaces any prior staging).
    */
  def stageIndex(docs: DataFrame, table: String, buckets: Int): Unit = {
    // ONE tokenize pass (r17): the postings pin once and feed BOTH the
    // bucketed write and the exact stats pair — the old shape re-tokenized
    // the raw corpus for the stats (batchStats). Stats deliberately come
    // from the pinned FRAME, not from reading the table back: a
    // `spark.table` read here would seed the session's relation cache with
    // the stage-time file listing, which later APPENDS do not reliably
    // invalidate (measured: a streamed append arm served stage-time
    // postings against the full ledger). Identical numbers by the shared
    // zero-token-doc invariant (see recomputeStats).
    val postings = buildPostings(docs).localCheckpoint(true)
    Bucketing.writeBucketed(postings, table, "w", buckets)
    Bucketing.writeTable(
      postings.groupBy("doc_id").agg(max("dl").as("dl"))
        .agg(count(lit(1)).as("n"), coalesce(sum("dl"), lit(0L)).as("total_dl")),
      statsTable(table))
    postings.unpersist(blocking = false)
  }

  /** Fold a batch of NEW docs into an existing index: postings append into
    * their term buckets (existing files untouched, pruning preserved), and
    * the batch's exact `(n, total_dl)` pair appends as one ledger ROW — the
    * old stats are never read or rewritten, so there is no lost-update
    * window and probe-time stats stay a pure sum. Docs already indexed must
    * not reappear in a batch — same contract as the staged-ANN appends.
    * Single-writer per index; see the object doc for the torn-append story.
    */
  def appendToIndex(batch: DataFrame, table: String, buckets: Int): Unit = {
    val spark = batch.sparkSession
    val (bn, bdl) = batchStats(batch)
    Bucketing.appendBucketed(buildPostings(batch), table, "w", buckets)
    import spark.implicits._
    Bucketing.appendTable(Seq((bn, bdl)).toDF("n", "total_dl"), statsTable(table))
  }

  /** Rebuild the stats ledger exactly from the postings table — the recovery
    * path if an append crashed between its postings and stats writes. Full
    * postings scan (maintenance-time, not probe-time): each doc carries its
    * `dl` on every posting, so `n` is the distinct-doc count and `total_dl`
    * the sum of one `dl` per doc. Exact relative to [[batchStats]] because
    * both exclude zero-token docs (no postings ⇒ not counted; see the
    * invariant note on batchStats).
    */
  def recomputeStats(spark: SparkSession, table: String): Unit = {
    val pair = Bucketing.read(spark, table)
      .groupBy("doc_id").agg(max("dl").as("dl"))
      .agg(count(lit(1)).as("n"), coalesce(sum("dl"), lit(0L)).as("total_dl"))
    Bucketing.writeTable(pair, statsTable(table))
  }

  private def tombTable(table: String) = s"${table}_tomb"

  /** Record a document-DELETE batch against the index as TOMBSTONES — the
    * Lucene move: a doc's postings scatter across as many term buckets as
    * it has distinct terms, so physical removal per delete request would
    * rewrite most of the index; instead the ids land in a doc-keyed
    * sidecar, probes shadow them, and [[mergeDeletes]] applies them at
    * maintenance time. Cost ∝ batch.
    */
  def deleteFromIndex(batch: DataFrame, table: String): Unit =
    Bucketing.appendTable(batch.select("doc_id"), tombTable(table))

  /** [[probeIndex]] over a tombstone-carrying index, with LUCENE-EXACT
    * staleness semantics: deleted docs vanish from the RESULTS immediately,
    * but df and the (n, avgdl) scalars still count them until the merge —
    * docFreq/corpus stats in a live Lucene index include deleted docs'
    * contributions until segments merge, and reproducing that published
    * behavior (rather than half-adjusting) is what keeps the probe
    * oracle-expressible: full-corpus stats, result set filtered.
    */
  def probeIndexTombstoned(spark: SparkSession, table: String,
                           terms: Seq[String], k: Int,
                           k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "probeIndexTombstoned needs at least one query term")
    val tomb = spark.table(tombTable(table)).select("doc_id").distinct()
    probeWith(spark, table, terms, k, k1, b,
      scoring => scoring.join(broadcast(tomb), Seq("doc_id"), "left_anti"))
  }

  /** Apply accumulated tombstones physically — the MERGE: rewrite the
    * postings minus the deleted docs' rows and rebuild the EXACT stats
    * ledger over the survivors, so post-merge scoring uses the reduced
    * corpus's n/avgdl/df (scores legitimately change at the merge — that
    * is Lucene's contract too). Unlike the ANN index's bucket-local
    * deletes, doc tombstones dirty ~every term bucket (a doc's postings
    * live in all its terms' buckets), so the merge is the full-rewrite
    * maintenance job segment merging is everywhere; the current rows pin
    * through an eager checkpoint before the drop-and-rewrite.
    */
  def mergeDeletes(spark: SparkSession, table: String, buckets: Int): Unit = {
    val tomb = spark.table(tombTable(table)).select("doc_id").distinct()
    val kept = Bucketing.read(spark, table)
      .join(tomb, Seq("doc_id"), "left_anti")
      .localCheckpoint(true)
    Bucketing.writeBucketed(kept, table, "w", buckets)
    // exact survivor stats from the already-pinned rows (r17) — same
    // arithmetic as recomputeStats without re-reading the fresh table
    Bucketing.writeTable(
      kept.groupBy("doc_id").agg(max("dl").as("dl"))
        .agg(count(lit(1)).as("n"), coalesce(sum("dl"), lit(0L)).as("total_dl")),
      statsTable(table))
    Bucketing.dropStaged(spark, tombTable(table))
  }

  /** BM25 top-`k` for literal `terms`, served from the staged index. The
    * postings scan carries an IN filter on the bucket key, so only the
    * buckets the terms hash to are read; df comes from the pruned postings;
    * the scalars broadcast. Score arithmetic mirrors
    * `TextQueries.bm25Scores` term-for-term.
    */
  def probeIndex(spark: SparkSession, table: String, terms: Seq[String], k: Int,
                 k1: Double = 1.2, b: Double = 0.75): DataFrame =
    probeWith(spark, table, terms, k, k1, b, identity)

  private def probeWith(spark: SparkSession, table: String, terms: Seq[String],
                        k: Int, k1: Double, b: Double,
                        shadow: DataFrame => DataFrame): DataFrame = {
    require(terms.nonEmpty, "probeIndex needs at least one query term")
    val idx = Bucketing.read(spark, table).filter(col("w").isin(terms: _*))
    val dfreq = idx.groupBy("w").agg(count(lit(1)).as("df"))
    val stats = spark.table(statsTable(table))
      .agg(sum("n").as("ni"), sum("total_dl").as("tdl"))
      .select(col("ni").cast("double").as("n"),
        (col("tdl").cast("double") / col("ni")).as("avgdl"))
    shadow(idx).join(broadcast(dfreq), "w").crossJoin(broadcast(stats))
      .select(col("doc_id"),
        (log(lit(1.0) + (col("n") - col("df") + 0.5) / (col("df") + 0.5)) *
          (col("tf") * (k1 + 1)) /
          (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / col("avgdl")))).as("ts"))
      .groupBy("doc_id")
      .agg(round(
        expr("aggregate(array_sort(collect_list(ts)), CAST(0.0 AS DOUBLE), (a, x) -> a + x)"),
        6).as("bm25"))
      .orderBy(desc("bm25"), asc("doc_id"))
      .limit(k)
  }
}
