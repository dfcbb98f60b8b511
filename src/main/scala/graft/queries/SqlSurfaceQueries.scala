package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables
import graft.operators.Similarity

/** The C20 SQL surface, oracled: a declared query built ENTIRELY through
  * `spark.sql(...)` using the extension-registered native kernels
  * (`graft_dot`, `graft_idot`, `graft_lsh_code` — GraftExtensions), so the
  * registered-function path gets a CORRECTNESS row of its own instead of
  * spec-only coverage. The SQL text is what a `spark-sql` user of the
  * library would type; the DuckDB oracle re-derives each kernel from its
  * published definition.
  */
object SqlSurfaceQueries {

  /** Integer codes for the `graft_idot` leg: floor(100·x) in DOUBLE on both
    * engines (exact for float inputs, so no rounding divergence), small
    * enough that the 64-term integer dot can't approach Long range — the
    * regime `graft_idot`'s unchecked arithmetic is documented for.
    */
  private val idotScale = "100.0"

  /** q40 — nearest-20 by `graft_dot` against the vec_id=0 query vector, with
    * each row's `graft_lsh_code` and the integer `graft_idot` of floor-scaled
    * codes. Exercises scalar kernels through SQL parsing, FunctionRegistry
    * resolution, and codegen — the full path a SQL-only user hits.
    */
  def q40(s: SparkSession, dir: String): DataFrame = {
    Tables.embeddings(s, dir).createOrReplaceTempView("graft_sql_emb")
    s.sql(
      s"""WITH q AS (SELECT embedding AS qe FROM graft_sql_emb WHERE vec_id = 0)
         |SELECT e.vec_id,
         |       round(graft_dot(e.embedding, q.qe), 6) AS dot,
         |       graft_lsh_code(e.embedding) AS lsh_code,
         |       graft_idot(
         |         transform(e.embedding, x -> CAST(floor(CAST(x AS DOUBLE) * $idotScale) AS BIGINT)),
         |         transform(q.qe,        x -> CAST(floor(CAST(x AS DOUBLE) * $idotScale) AS BIGINT))) AS idot
         |FROM graft_sql_emb e CROSS JOIN q
         |ORDER BY dot DESC, e.vec_id
         |LIMIT 20""".stripMargin)
  }

  val oracle: Map[String, String] = Map(
    "q40_sql_surface" -> {
      val d = Similarity.dims
      def icode(v: String, i: String) =
        s"CAST(floor(CAST($v[$i] AS DOUBLE) * $idotScale) AS BIGINT)"
      s"""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
         |SELECT e.vec_id,
         |  round(${SqlGen.dotSql("e.embedding", "q.qe")}, 6) AS dot,
         |  ${Similarity.lshCodeSql("e.embedding")} AS lsh_code,
         |  CAST(list_sum(list_transform(range(1, ${d + 1}),
         |    i -> ${icode("e.embedding", "i")} * ${icode("q.qe", "i")})) AS BIGINT) AS idot
         |FROM embeddings e, q
         |ORDER BY dot DESC, e.vec_id LIMIT 20""".stripMargin
    })
}
