package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.multimodal.{FakeDecoder, Media, MediaRecord}

/** Multimodal-column queries: binary payloads + typed metadata through the
  * mapPartitions decode/feature/frame operators. The decode itself is the
  * deterministic [[FakeDecoder]] stub (no codecs in this environment), which
  * is exactly what makes a SQL oracle possible: every output is a pure
  * function of md5(payload).
  *
  * Payloads here are the `documents.text` bytes; a real media table swaps the
  * payload source and decoder, not the plumbing.
  */
object MultimodalQueries {

  private def records(s: SparkSession, dir: String) = {
    import s.implicits._
    Tables.documents(s, dir)
      .select(col("doc_id").as("id"), lit("image").as("kind"),
        col("text").cast("binary").as("payload"))
      .as[MediaRecord]
  }

  /** Decoded metadata: byte length, checksum, fake dimensions. */
  def meta(s: SparkSession, dir: String): DataFrame =
    Media.decodeMeta(records(s, dir), FakeDecoder)
      .select(col("id").as("doc_id"), col("n_bytes"), col("checksum"),
        col("width"), col("height"))
      .orderBy("doc_id")
      .limit(200)

  /** Feature extraction: 8-dim deterministic pseudo-embedding, flattened to
    * scalar columns (f0..f7) for the oracle compare.
    */
  def features(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ds = records(s, dir).mapPartitions { it =>
      it.map(r => (r.id, FakeDecoder.features(r.payload, 8)))
    }
    ds.select(col("_1").as("doc_id") +:
        (0 until 8).map(i => col("_2").getItem(i).as(s"f$i")): _*)
      .orderBy("doc_id")
      .limit(200)
  }

  /** Frame sampling: each row fans out to 1-4 frames with checksums. */
  def frames(s: SparkSession, dir: String): DataFrame =
    Media.sampleFrames(records(s, dir), FakeDecoder)
      .select(col("id").as("doc_id"), col("frame_idx").cast("long").as("frame_idx"),
        col("frame_checksum"))
      .orderBy("doc_id", "frame_idx")

  /** `mm_dedup` — content-hash payload dedup audit: the universal first
    * pass of a multimodal pipeline ("how many uploads are byte-identical;
    * how many bytes does keeping one of each save"). Rides the decode
    * layer's checksum (so a real pipeline dedups on the DECODED canonical
    * bytes, surviving container-level noise a raw-byte hash would miss),
    * then two partial-aggregable rollups to ONE audit row — payload count,
    * distinct payloads, duplicate groups, and the byte savings of keeping
    * one representative per group (the number a storage owner acts on).
    */
  def dedup(s: SparkSession, dir: String): DataFrame =
    Media.decodeMeta(records(s, dir), FakeDecoder)
      .groupBy("checksum")
      .agg(count(lit(1)).as("n_copies"), sum("n_bytes").as("b"),
        max("n_bytes").as("b1"))
      .agg(sum("n_copies").as("payloads"),
        count(lit(1)).as("distinct_payloads"),
        count(when(col("n_copies") >= 2, 1)).as("dup_groups"),
        sum(col("b") - col("b1")).as("reclaimable_bytes"))

  val oracle: Map[String, String] = Map(
    "mm_dedup" ->
      """WITH g AS (SELECT md5(text) AS checksum, count(*) AS n_copies,
        |  sum(octet_length(encode(text))) AS b,
        |  max(octet_length(encode(text))) AS b1 FROM documents GROUP BY 1)
        |SELECT CAST(sum(n_copies) AS BIGINT) AS payloads,
        |  count(*) AS distinct_payloads,
        |  count(CASE WHEN n_copies >= 2 THEN 1 END) AS dup_groups,
        |  CAST(sum(b - b1) AS BIGINT) AS reclaimable_bytes
        |FROM g""".stripMargin,
    "mm_meta" ->
      """SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        | md5(text) AS checksum, ('0x'||substr(md5(text),1,2))::INT AS width,
        | ('0x'||substr(md5(text),3,2))::INT AS height
        | FROM documents ORDER BY doc_id LIMIT 200""".stripMargin.replaceAll("\n", ""),
    "mm_features" ->
      (0 until 8).map(i =>
          s"(('0x'||substr(md5(text),${1 + 2 * i},2))::INT - 128)/128.0 AS f$i")
        .mkString("SELECT doc_id, ", ", ", " FROM documents ORDER BY doc_id LIMIT 200"),
    "mm_frames" ->
      """WITH m AS (SELECT doc_id, md5(text) AS h FROM documents),
        |n AS (SELECT doc_id, h, ('0x'||substr(h,5,1))::INT % 4 + 1 AS nf FROM m),
        |f AS (SELECT doc_id, h, unnest(range(0, nf)) AS frame_idx FROM n)
        |SELECT doc_id, frame_idx, md5(h||':'||frame_idx) AS frame_checksum
        |FROM f ORDER BY doc_id, frame_idx""".stripMargin)
}
