package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFunctions._

/** Text-analysis query set over `documents` (language ID, quality scoring,
  * token counting, fingerprinting). Spark side is pure Catalyst expressions;
  * oracles are generated from the same constants in [[SqlGen]].
  */
object TextQueries {

  /** Confusion-matrix style crosstab: labeled lang × heuristic prediction. */
  def langid(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("lang"), langId(col("text")).as("predicted"))
      .groupBy("lang", "predicted")
      .agg(count(lit(1)).as("c"))
      .orderBy("lang", "predicted")

  /** Per-doc quality metrics (token count, punctuation/stopword ratios,
    * composite score).
    */
  def quality(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(
        col("doc_id"),
        tokenCount(col("text")).as("toks"),
        round(punctRatio(col("text")), 6).as("punct"),
        round(stopwordRatio(col("text")), 6).as("swr"),
        round(qualityScore(col("text")), 6).as("quality"))
      .orderBy("doc_id")
      .limit(200)

  /** Token counts per language: whitespace tokens + regex (BPE-ish) tokens. */
  def tokens(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("lang"),
        tokenCount(col("text")).as("t"),
        regexTokenCount(col("text")).as("rt"))
      .groupBy("lang")
      .agg(sum("t").as("ws_tokens"), sum("rt").as("re_tokens"))
      .orderBy("lang")

  /** Gopher-style repetition/shape signals per doc: duplicate-3-gram
    * fraction and mean word length — the intra-document counterparts of the
    * corpus-level dedup ops.
    */
  def repetition(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(
        col("doc_id"),
        round(dupNgramFrac(col("text")), 6).as("dup3"),
        round(meanWordLen(col("text")), 6).as("mwl"))
      .orderBy("doc_id")
      .limit(200)

  /** Rolling-hash fingerprints: the content-defined min-hash per doc (docs
    * sharing long substrings tend to share it, single edits elsewhere leave
    * it untouched).
    */
  def rollingFp(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), rollingFingerprint(col("text")).as("rfp"))
      .orderBy("doc_id")
      .limit(200)

  /** Fingerprint clusters: docs whose sorted-distinct-word set collides. */
  def fingerprints(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(fingerprint(col("text")).as("fp"), col("doc_id"))
      .groupBy("fp")
      .agg(count(lit(1)).as("c"), min("doc_id").as("keeper"))
      .orderBy(desc("c"), asc("fp"))
      .limit(50)

  val oracle: Map[String, String] = {
    val punctSql =
      "(CASE WHEN length(text) = 0 THEN 0.0 ELSE (length(text)-length(regexp_replace(text,'[.,;:!?]','','g')))*1.0/length(text) END)"
    val toksSql = "len(string_split(text,' '))"
    val swrSql = s"CAST(${SqlGen.hitsSql("en")} AS DOUBLE)/$toksSql"
    val qualSql =
      s"least($toksSql/100.0, 1.0)*0.4 + (1.0 - $punctSql)*0.3 + least($swrSql*5.0, 1.0)*0.3"
    Map(
      "text_langid" ->
        s"""SELECT lang, predicted, count(*) AS c FROM
           | (SELECT lang, ${SqlGen.langIdSql} AS predicted FROM documents) t
           | GROUP BY lang, predicted ORDER BY lang, predicted""".stripMargin.replaceAll("\n", ""),
      "text_quality" ->
        s"""SELECT doc_id, CAST($toksSql AS BIGINT) AS toks, round($punctSql, 6) AS punct,
           | round($swrSql, 6) AS swr, round($qualSql, 6) AS quality
           | FROM documents ORDER BY doc_id LIMIT 200""".stripMargin.replaceAll("\n", ""),
      "text_tokens" ->
        s"""SELECT lang, CAST(sum($toksSql) AS BIGINT) AS ws_tokens,
           | CAST(sum(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+'))) AS BIGINT) AS re_tokens
           | FROM documents GROUP BY lang ORDER BY lang""".stripMargin.replaceAll("\n", ""),
      "text_repetition" -> {
        val g = "list_transform(range(1, len(W)-1), i -> W[i]||' '||W[i+1]||' '||W[i+2])"
        s"""SELECT doc_id,
           | round(CASE WHEN len(W) < 3 THEN 0.0 ELSE 1.0 - len(list_distinct($g))*1.0/(len(W)-2) END, 6) AS dup3,
           | round(CASE WHEN length(text) = 0 THEN 0.0 ELSE CAST(list_sum(list_transform(W, x -> length(x))) AS DOUBLE)/len(W) END, 6) AS mwl
           | FROM (SELECT doc_id, text, string_split(text,' ') AS W FROM documents) t
           | ORDER BY doc_id LIMIT 200""".stripMargin.replaceAll("\n", "")
      },
      "text_rolling_fp" -> {
        val w = 8; val B = 257L; val mask = 0xFFFFFFFFL
        val ks = (0 until w).map { j =>
          var p = 1L; (0 until (w - 1 - j)).foreach(_ => p = (p * B) & mask); p
        }
        val term = (0 until w)
          .map(j => s"CAST(ascii(substr(text, i+$j, 1)) AS BIGINT)*${ks(j)}").mkString(" + ")
        s"""SELECT doc_id, CASE WHEN length(text) < $w THEN CAST(0 AS BIGINT)
           | ELSE list_min(list_transform(range(1, length(text)-${w - 2}), i -> ($term) & $mask)) END AS rfp
           | FROM documents ORDER BY doc_id LIMIT 200""".stripMargin.replaceAll("\n", "")
      },
      "text_fingerprint" ->
        """SELECT fp, count(*) AS c, min(doc_id) AS keeper FROM
          | (SELECT md5(array_to_string(list_sort(list_distinct(string_split(lower(text),' '))),' ')) AS fp,
          |         doc_id FROM documents) t
          | GROUP BY fp ORDER BY c DESC, fp LIMIT 50""".stripMargin.replaceAll("\n", ""))
  }
}
