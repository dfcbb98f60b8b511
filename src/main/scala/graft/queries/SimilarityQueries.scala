package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables
import graft.operators.Similarity

/** ANN search queries over `embeddings` (C12). `q19_cosine_topk` in
  * CoreQueries is the exact baseline; this adds the LSH-bucketed scale path.
  */
object SimilarityQueries {

  /** Code Hamming radius for the LSH top-k: 3 of 16 planes disagreeing
    * (81% agreement — the same selectivity regime as the pre-widening 2-of-8)
    * keeps the candidate pool big enough to fill k at small corpus sizes.
    */
  val lshTopKHamming = 3

  /** Top-10 by cosine among LSH candidates (code Hamming <= 3 from the
    * query's code) — the approximate variant of q19.
    */
  def lshTopK(s: SparkSession, dir: String): DataFrame =
    Similarity.lshTopK(Tables.embeddings(s, dir), queryId = 0L, k = 10, maxHamming = lshTopKHamming)

  /** Top-10 via IVF probing (2 of 16 inverted lists searched). */
  def ivfTopK(s: SparkSession, dir: String): DataFrame =
    Similarity.ivfTopK(Tables.embeddings(s, dir), queryId = 0L)

  /** Lloyd iterations for the declared TRAINED-codebook query (small so the
    * unrolled oracle CTE chain stays readable; the operator default is 3).
    */
  val trainedIters = 2

  /** Top-10 via IVF over a TRAINED codebook: the full
    * train→assign→probe→search path, end-to-end. Possible to oracle because
    * [[Similarity.trainCentroids]] computes every cluster mean by
    * sort-then-sum — bit-identical across partitionings and engines.
    */
  def ivfTrainedTopK(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    Similarity.ivfTopK(emb, queryId = 0L,
      trained = Some(Similarity.trainCentroids(emb, iters = trainedIters)))
  }

  /** Top-10 by int8-quantized cosine — ranking never touches the float
    * vectors after quantization.
    */
  def quantTopK(s: SparkSession, dir: String): DataFrame =
    Similarity.quantTopK(Tables.embeddings(s, dir), queryId = 0L, k = 10)

  /** Top-10 by cosine in the random-projection-REDUCED space (64→16 dims,
    * [[Similarity.withRandomProjection]]): the JL bandwidth/FLOP cut
    * composed with the q19 broadcast-and-TakeOrdered search shape.
    */
  def rpTopK(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val emb = Similarity.withRandomProjection(Tables.embeddings(s, dir))
      .select(col("vec_id"), col("rp"))
    val q = emb.filter(col("vec_id") === 0).select(col("rp").as("qr"))
    emb.crossJoin(broadcast(q))
      .select(col("vec_id"),
        round(graft.functions.VectorOps.cosine(col("rp"), col("qr")), 6).as("rp_cos"))
      .orderBy(desc("rp_cos"), asc("vec_id"))
      .limit(10)
  }

  /** Code-width FLOOR for the declared batch-ANN query: 8 planes keeps the
    * Hamming-≤1 ball dense enough to fill k at verify-scale corpora. The
    * width itself is data-scaled ([[Similarity.planesFor]] with this floor),
    * so the join-key cardinality grows with the corpus — the floor only
    * applies below 64·2^8 ≈ 16k vectors, which is also the regime where the
    * fixed-width oracle below stays valid.
    */
  val batchPlanes = 8

  /** Batch ANN: top-5 neighbors for every query in a 3-vector batch, over a
    * code space scaled to the corpus (floored at [[batchPlanes]], the value
    * the oracle is rendered with).
    */
  def batchTopK(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    import org.apache.spark.sql.functions.col
    Similarity.lshBatchTopK(emb, emb.filter(col("vec_id") < 3), k = 5,
        planesOpt = Some(Similarity.planesFor(emb.count(), floor = batchPlanes)))
      .orderBy("query_id", "rn")
  }

  /** DuckDB rendering of the full trained-IVF path: the [[trainedIters]]
    * Lloyd iterations unrolled as CTE generations (assignment argmax via
    * ROW_NUMBER with the same (cos DESC, cid) tie rule as Spark's `max_by`;
    * per-position means as list_sum over a SORTED value list — the identical
    * fixed summation order as the Scala side), then assign-all, probe the 2
    * nearest lists, exact cosine top-10.
    */
  private def ivfTrainedSql(k: Int = Similarity.ivfCentroids,
                            iters: Int = trainedIters,
                            sampleMax: Long = 4096L): String = {
    val d = Similarity.dims
    val gens = (1 to iters).map { i =>
      s"""asn$i AS (SELECT vec_id, cid FROM
         | (SELECT s.vec_id, c.cid, ROW_NUMBER() OVER (PARTITION BY s.vec_id
         |    ORDER BY ${SqlGen.cosSql("s.embedding", "c.ce")} DESC, c.cid) AS rn
         |  FROM sample s, cent${i - 1} c) t WHERE rn = 1),
         |mean$i AS (SELECT a.cid, t.pos,
         |  list_sum(list_sort(list(CAST(s.embedding[t.pos] AS DOUBLE))))/count(*) AS m
         |  FROM sample s JOIN asn$i a ON a.vec_id = s.vec_id,
         |       (SELECT range AS pos FROM range(1, ${d + 1})) t
         |  GROUP BY a.cid, t.pos),
         |new$i AS (SELECT cid, list(CAST(m AS FLOAT) ORDER BY pos) AS ce
         |          FROM mean$i GROUP BY cid),
         |cent$i AS (SELECT p.cid, coalesce(n.ce, p.ce) AS ce
         |           FROM cent${i - 1} p LEFT JOIN new$i n ON n.cid = p.cid)""".stripMargin
    }.mkString(",\n")
    s"""WITH sample AS (SELECT vec_id, embedding FROM embeddings
       |  WHERE vec_id % (SELECT greatest(1, count(*)//$sampleMax) FROM embeddings) = 0),
       |cent0 AS (SELECT vec_id AS cid, embedding AS ce FROM embeddings WHERE vec_id < $k),
       |$gens,
       |fasn AS (SELECT vec_id, cid FROM
       | (SELECT e.vec_id, c.cid, ROW_NUMBER() OVER (PARTITION BY e.vec_id
       |    ORDER BY ${SqlGen.cosSql("e.embedding", "c.ce")} DESC, c.cid) AS rn
       |  FROM embeddings e, cent$iters c) t WHERE rn = 1),
       |q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
       |qprobe AS (SELECT cid FROM
       | (SELECT c.cid, ROW_NUMBER() OVER (ORDER BY ${SqlGen.cosSql("c.ce", "q.qe")} DESC, c.cid) AS rn
       |  FROM cent$iters c, q) t WHERE rn <= 2)
       |SELECT e.vec_id, round(${SqlGen.cosSql("e.embedding", "q.qe")}, 6) AS cos_sim
       |FROM embeddings e JOIN fasn a ON a.vec_id = e.vec_id JOIN qprobe p ON p.cid = a.cid, q
       |ORDER BY cos_sim DESC, e.vec_id LIMIT 10""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "sim_ivf_trained" -> ivfTrainedSql(),
    "sim_rp_topk" ->
      s"""WITH proj AS (SELECT vec_id, ${Similarity.randomProjectionSql("embedding")} AS rp FROM embeddings),
         |q AS (SELECT rp AS qr FROM proj WHERE vec_id = 0)
         |SELECT p.vec_id, round(${SqlGen.cosSql("p.rp", "q.qr", 16)}, 6) AS rp_cos
         |FROM proj p, q
         |ORDER BY rp_cos DESC, p.vec_id LIMIT 10""".stripMargin,
    "sim_ivf_topk" ->
      s"""WITH cent AS (SELECT vec_id AS cid, embedding AS ce FROM embeddings WHERE vec_id < 16),
         |asn AS (SELECT vec_id, cid, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid) AS rn FROM
         |  (SELECT e.vec_id, c.cid, ${SqlGen.cosSql("e.embedding", "c.ce")} AS ccos FROM embeddings e, cent c) t),
         |a AS (SELECT vec_id, cid FROM asn WHERE rn = 1),
         |q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
         |qprobe AS (SELECT cid FROM
         |  (SELECT c.cid, ROW_NUMBER() OVER (ORDER BY ${SqlGen.cosSql("c.ce", "q.qe")} DESC, c.cid) AS rn
         |   FROM cent c, q) t WHERE rn <= 2)
         |SELECT e.vec_id, round(${SqlGen.cosSql("e.embedding", "q.qe")}, 6) AS cos_sim
         |FROM embeddings e JOIN a ON a.vec_id = e.vec_id JOIN qprobe p ON p.cid = a.cid, q
         |ORDER BY cos_sim DESC, e.vec_id LIMIT 10""".stripMargin,
    "sim_batch_topk" ->
      s"""WITH coded AS (SELECT vec_id, embedding, ${Similarity.lshCodeSql("embedding", batchPlanes)} AS lsh_code FROM embeddings),
         |q AS (SELECT * FROM coded WHERE vec_id < 3),
         |cand AS (SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
         |  round(${SqlGen.cosSql("q.embedding", "c.embedding")}, 6) AS cos_sim
         |  FROM q JOIN coded c ON bit_count(xor(q.lsh_code, c.lsh_code)) <= 1 AND q.vec_id <> c.vec_id)
         |SELECT query_id, cand_id, cos_sim, CAST(rn AS INTEGER) AS rn FROM
         | (SELECT query_id, cand_id, cos_sim,
         |   row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, cand_id) AS rn FROM cand) t
         |WHERE rn <= 5 ORDER BY query_id, rn""".stripMargin,
    "sim_quant_topk" -> {
      def idot(a: String, b: String) =
        s"CAST(list_sum(list_transform(range(1, ${Similarity.dims + 1}), i -> $a[i]*$b[i])) AS DOUBLE)"
      s"""WITH scaled AS (SELECT vec_id, embedding,
         |  list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE))))/127.0 AS qscale FROM embeddings),
         |coded AS (SELECT vec_id, CASE WHEN qscale = 0.0 THEN list_transform(embedding, x -> CAST(0 AS BIGINT))
         |  ELSE list_transform(embedding, x -> CAST(trunc(CAST(x AS DOUBLE)/qscale) AS BIGINT)) END AS qcodes FROM scaled),
         |q AS (SELECT qcodes AS qq FROM coded WHERE vec_id = 0)
         |SELECT vec_id, round(CASE WHEN ${idot("qcodes", "qcodes")} = 0 OR ${idot("qq", "qq")} = 0 THEN 0.0
         |  ELSE ${idot("qcodes", "qq")}/(sqrt(${idot("qcodes", "qcodes")})*sqrt(${idot("qq", "qq")})) END, 6) AS qcos
         |FROM coded, q
         |ORDER BY qcos DESC, vec_id LIMIT 10""".stripMargin
    },
    "sim_lsh_topk" ->
      s"""WITH coded AS (SELECT vec_id, embedding, ${Similarity.lshCodeSql("embedding")} AS lsh_code FROM embeddings),
         |q AS (SELECT embedding AS qe, lsh_code AS qcode FROM coded WHERE vec_id = 0)
         |SELECT vec_id, round(${SqlGen.cosSql("embedding", "qe")}, 6) AS cos_sim
         |FROM coded, q
         |WHERE bit_count(xor(lsh_code, qcode)) <= $lshTopKHamming
         |ORDER BY cos_sim DESC, vec_id LIMIT 10""".stripMargin)
}
