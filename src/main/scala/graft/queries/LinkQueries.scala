package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.FuzzyJoin

/** Record-linkage queries: entity resolution over relational records (the
  * counterpart of document dedup — same block/cap/verify discipline, applied
  * to typed rows instead of text shingles).
  */
object LinkQueries {

  val linkMaxDist = 4
  val linkBlockCap = 200

  /** `link_parts` — for every part, its closest same-noun/same-size
    * neighbor by name edit distance: the "is this a duplicate listing"
    * resolver. Blocks on (noun, p_size) — cheap equality keys with bounded
    * occupancy — then verifies candidates with codegen'd `levenshtein`.
    */
  def parts(s: SparkSession, dir: String): DataFrame = {
    // null-safe second-word extraction (`get` + coalesce, not element_at:
    // ANSI mode throws on out-of-range indexes) — a single-word name blocks
    // under '' exactly like the oracle's split_part
    val p = Tables.part(s, dir)
      .select(col("p_partkey"), col("p_name"), col("p_size"),
        coalesce(get(split(col("p_name"), " "), lit(1)), lit("")).as("noun"))
    FuzzyJoin.bestMatch(p, "p_partkey", Seq("noun", "p_size"), "p_name",
      (a, b) => levenshtein(a, b), maxDist = linkMaxDist, cap = linkBlockCap)
      .orderBy("p_partkey")
  }

  val oracle: Map[String, String] = Map(
    // Independent phrasing: DuckDB's levenshtein + QUALIFY-free row_number
    // filter; the cap window mirrors FuzzyJoin's occupancy guard.
    "link_parts" ->
      s"""WITH b AS (SELECT p_partkey, p_name, p_size,
         |    split_part(p_name, ' ', 2) AS noun,
         |    count(*) OVER (PARTITION BY split_part(p_name, ' ', 2), p_size) AS bs
         |  FROM part),
         |c AS (SELECT * FROM b WHERE bs <= ${LinkQueries.linkBlockCap}),
         |cand AS (SELECT x.p_partkey AS k1, y.p_partkey AS k2,
         |    levenshtein(x.p_name, y.p_name) AS dist
         |  FROM c x JOIN c y
         |    ON x.noun = y.noun AND x.p_size = y.p_size
         |   AND x.p_partkey <> y.p_partkey
         |  WHERE levenshtein(x.p_name, y.p_name) <= ${LinkQueries.linkMaxDist}),
         |r AS (SELECT k1, k2, dist,
         |    row_number() OVER (PARTITION BY k1 ORDER BY dist, k2) AS rn
         |  FROM cand)
         |SELECT k1 AS p_partkey, k2 AS match_key, dist
         |FROM r WHERE rn = 1 ORDER BY p_partkey""".stripMargin
  )
}
