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
        |ORDER BY rrf DESC, doc_id LIMIT 10""".stripMargin)
}
