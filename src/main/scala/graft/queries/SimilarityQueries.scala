package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables
import graft.operators.Similarity

/** ANN search queries over `embeddings` (C12). `q19_cosine_topk` in
  * CoreQueries is the exact baseline; this adds the LSH-bucketed scale path.
  */
object SimilarityQueries {

  /** Top-10 by cosine among LSH candidates (code Hamming <= 2 from the
    * query's code) — the approximate variant of q19.
    */
  def lshTopK(s: SparkSession, dir: String): DataFrame =
    Similarity.lshTopK(Tables.embeddings(s, dir), queryId = 0L, k = 10, maxHamming = 2)

  val oracle: Map[String, String] = Map(
    "sim_lsh_topk" ->
      s"""WITH coded AS (SELECT vec_id, embedding, ${Similarity.lshCodeSql("embedding")} AS lsh_code FROM embeddings),
         |q AS (SELECT embedding AS qe, lsh_code AS qcode FROM coded WHERE vec_id = 0)
         |SELECT vec_id, round(${SqlGen.cosSql("embedding", "qe")}, 6) AS cos_sim
         |FROM coded, q
         |WHERE bit_count(xor(lsh_code, qcode)) <= 2
         |ORDER BY cos_sim DESC, vec_id LIMIT 10""".stripMargin)
}
