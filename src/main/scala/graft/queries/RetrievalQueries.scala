package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Hybrid retrieval: the lexical arm (BM25 against doc 0's terms,
  * [[TextQueries.bm25Scores]]) and the dense arm (embedding cosine against
  * vec 0, the q19 shape) fused by reciprocal-rank fusion —
  * `score(d) = Σ_arms 1/(k + rank_arm(d))` with the standard k=60
  * (Cormack/Clarke/Buettcher's RRF). Rank-based fusion needs no score
  * calibration between arms, which is why it is the default in production
  * hybrid search.
  *
  * Scale shape: each arm ends in a TakeOrdered top-[[armDepth]] — the corpus
  * is never globally sorted. The rank windows run AFTER the limits, over
  * `armDepth` rows (single-partition but bounded by the constant, the
  * text_vocab pattern), and the fusion join matches two `armDepth`-row
  * frames — at 100 TB the arms dominate and are each one scan + thin
  * aggregates; fusion cost is O(armDepth).
  */
object RetrievalQueries {

  /** RRF smoothing constant (rank offset). */
  val rrfK = 60

  /** Candidates taken from each arm before fusion. */
  val armDepth = 20

  /** Literal query terms for the staged-index probe — the serving shape:
    * terms arrive as literals, so the postings scan bucket-prunes. Chosen
    * from the synthetic corpus's stable vocabulary (present at every SF).
    * Declared ABOVE the oracle map, which renders them into SQL at init.
    */
  val lexTerms = Seq("join", "scan", "merge")

  /** Postings buckets: a 3-term probe touches ≤ 3 of 8 — the pruning the
    * plan audit asserts. At 100 TB this would be thousands; the constant
    * sizes per-bucket files, not the algorithm.
    */
  val lexBuckets = 8

  /** Dense arm: corpus cosine vs vec 0, top-[[armDepth]] (broadcast query +
    * codegen'd dot product + TakeOrdered — the q19 serving shape).
    */
  private def cosineTop(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("qe"))
    emb.crossJoin(broadcast(q))
      .select(col("vec_id").as("doc_id"),
        round(graft.functions.VectorOps.cosine(col("embedding"), col("qe")), 6)
          .as("cos_sim"))
      .orderBy(desc("cos_sim"), asc("doc_id"))
      .limit(armDepth)
  }

  /** Top-10 fused ranking. Docs in both arms get both reciprocal terms;
    * docs in one arm get that arm's term alone (full outer join + coalesce).
    * Both ranks ride along so a consumer can see which arm surfaced a hit.
    */
  def hybrid(s: SparkSession, dir: String): DataFrame = {
    val bmTop = TextQueries.bm25Scores(s, dir)
      .orderBy(desc("bm25"), asc("doc_id")).limit(armDepth)
      .withColumn("rb",
        row_number().over(Window.orderBy(desc("bm25"), asc("doc_id"))).cast("int"))
    val cosTop = cosineTop(s, dir)
      .withColumn("rc",
        row_number().over(Window.orderBy(desc("cos_sim"), asc("doc_id"))).cast("int"))
    bmTop.select("doc_id", "rb")
      .join(cosTop.select("doc_id", "rc"), Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        round(coalesce(lit(1.0) / (lit(rrfK) + col("rb")), lit(0.0)) +
              coalesce(lit(1.0) / (lit(rrfK) + col("rc")), lit(0.0)), 6).as("rrf"),
        col("rb"), col("rc"))
      .orderBy(desc("rrf"), asc("doc_id"))
      .limit(10)
  }

  val oracle: Map[String, String] = Map(
    "search_hybrid" ->
      s"""${TextQueries.bm25WithChain},
        |bm AS (${TextQueries.bm25SelectSql}),
        |bmtop AS (SELECT doc_id, CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id) AS INTEGER) AS rb
        |  FROM (SELECT * FROM bm ORDER BY bm25 DESC, doc_id LIMIT $armDepth) tb),
        |qv AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
        |cos AS (SELECT e.vec_id AS doc_id, round(${SqlGen.cosSql("e.embedding", "qv.qe")}, 6) AS cos_sim
        |  FROM embeddings e, qv),
        |costop AS (SELECT doc_id, CAST(row_number() OVER (ORDER BY cos_sim DESC, doc_id) AS INTEGER) AS rc
        |  FROM (SELECT * FROM cos ORDER BY cos_sim DESC, doc_id LIMIT $armDepth) tc)
        |SELECT COALESCE(b.doc_id, c.doc_id) AS doc_id,
        |  round(COALESCE(CAST(1.0 AS DOUBLE)/($rrfK + b.rb), 0.0) +
        |        COALESCE(CAST(1.0 AS DOUBLE)/($rrfK + c.rc), 0.0), 6) AS rrf,
        |  b.rb AS rb, c.rc AS rc
        |FROM bmtop b FULL OUTER JOIN costop c ON b.doc_id = c.doc_id
        |ORDER BY rrf DESC, doc_id LIMIT 10""".stripMargin,
    "search_lexical_staged" -> {
      val terms = lexTerms.map(t => s"'$t'").mkString(", ")
      val (k1, b) = (TextQueries.bm25K1, TextQueries.bm25B)
      s"""WITH tok AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w FROM documents),
         |tk AS (SELECT doc_id, w FROM tok WHERE w <> ''),
         |dl AS (SELECT doc_id, count(*) AS dl FROM tk GROUP BY doc_id),
         |st AS (SELECT CAST(count(*) AS DOUBLE) AS n, CAST(sum(dl) AS DOUBLE)/count(*) AS avgdl FROM dl),
         |q AS (SELECT unnest([$terms]) AS w),
         |tf AS (SELECT doc_id, t.w, count(*) AS tf FROM tk t JOIN q ON q.w = t.w GROUP BY doc_id, t.w),
         |dfreq AS (SELECT w, count(*) AS df FROM (SELECT DISTINCT doc_id, w FROM tk JOIN q USING (w)) dq GROUP BY w)
         |SELECT tf.doc_id AS doc_id,
         |  round(list_sum(list_sort(list(
         |    ln(1.0 + (st.n - dfreq.df + 0.5)/(dfreq.df + 0.5)) * (tf.tf * ${k1 + 1}) /
         |    (tf.tf + $k1 * (${1 - b} + $b * dl.dl / st.avgdl))))), 6) AS bm25
         |FROM tf JOIN dfreq ON dfreq.w = tf.w JOIN dl ON dl.doc_id = tf.doc_id, st
         |GROUP BY tf.doc_id ORDER BY bm25 DESC, doc_id LIMIT 10""".stripMargin
    })

  /** The staged lexical index, built once per (session, dir) and
    * re-validated against the catalog — same cache discipline as the staged
    * ANN tables.
    */
  private def lexTable(s: SparkSession, dir: String): String =
    BackboneRegistry.namesOrBuild(s, s"lexidx:$dir")(
      _.forall(s.catalog.tableExists)) {
      val tag = dir.split('/').last.replace('.', '_') +
        "_" + java.lang.Integer.toUnsignedString(dir.hashCode, 36)
      val t = s"graft_lexidx_$tag"
      val fp = graft.operators.Staging.fingerprint(s, dir, s"lexidx:b$lexBuckets")
      graft.operators.Staging.ensure(s, fp, Seq(t, s"${t}_stats")) {
        graft.operators.TextIndex.stageIndex(Tables.documents(s, dir), t, lexBuckets)
      }
      Seq(t)
    }.head

  /** BM25 top-10 for [[lexTerms]] served from the staged inverted index
    * (C29's serving move applied to text): the postings scan reads only the
    * buckets the literal terms hash to, df comes from those same pruned
    * postings, the two corpus scalars ride a broadcast — lookup I/O ∝ the
    * queried terms' postings, never the corpus.
    */
  def lexicalStaged(s: SparkSession, dir: String): DataFrame =
    graft.operators.TextIndex.probeIndex(s, lexTable(s, dir), lexTerms, k = 10,
      k1 = TextQueries.bm25K1, b = TextQueries.bm25B)
}
