package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, Observation}
import org.apache.spark.sql.functions._

/** The reference's dataflow, Spark-first: decode → project/coerce.
  *
  * Works identically on batch and streaming DataFrames (same Catalyst
  * expressions), so the streaming layer reuses it verbatim.
  *
  * Semantics matched to the reference:
  *  - malformed JSON is dropped, pipeline continues
  *    (`/root/reference/pkg/kafka/ingest_kafka.go:40-44`);
  *  - only the 12 known keys are extracted, everything else ignored
  *    (`/root/reference/pkg/clickhouse/export_clickhouse.go:45-79`);
  *  - absent keys get Go zero values `""`/`0` (same lines);
  *  - `Bytes`/`Packets` truncate float→int toward zero
  *    (`export_clickhouse.go:76,79` — Spark double→long cast truncates too).
  *
  * One documented improvement: a present-but-wrong-typed field is nulled by
  * `from_json` and then defaulted, where the reference panics on the
  * unchecked type assertion (`export_clickhouse.go:45-79`).
  */
object FlowPipeline {

  /** Parse schema = flow fields + a corrupt-record marker: Spark's PERMISSIVE
    * `from_json` returns an all-null struct (not a null struct) for
    * unparseable input, so the only reliable bad-record signal is
    * `columnNameOfCorruptRecord`.
    */
  private val corruptCol = "_corrupt_record"
  private val parseSchema = FlowSchema.input.add(corruptCol, org.apache.spark.sql.types.StringType)
  private val parseOpts = Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> corruptCol)

  private def parsed(df: DataFrame, valueCol: String): DataFrame =
    df.withColumn("flow", from_json(col(valueCol).cast("string"), parseSchema, parseOpts))

  /** Parse a string column of raw JSON into the flow struct and drop
    * malformed records. Layer A2+A3.
    */
  def decode(df: DataFrame, valueCol: String = "value"): DataFrame =
    parsed(df, valueCol)
      .filter(col(s"flow.$corruptCol").isNull)
      .select("flow.*")
      .drop(corruptCol)

  /** Decode with a named drop counter, the Spark analogue of the reference's
    * per-record error log (`ingest_kafka.go:41`): metrics `malformed` and
    * `total` are published through `Observation` / `StreamingQueryProgress`
    * without a second pass over the data.
    */
  def decodeObserved(df: DataFrame, obs: Observation, valueCol: String = "value"): DataFrame =
    parsed(df, valueCol)
      .observe(obs,
        count(lit(1)).as("total"),
        count(when(col(s"flow.$corruptCol").isNotNull, 1)).as("malformed"))
      .filter(col(s"flow.$corruptCol").isNull)
      .select("flow.*")
      .drop(corruptCol)

  /** Metric-set name used by [[decodeNamed]] / surfaced in
    * `StreamingQueryProgress.observedMetrics`.
    */
  val decodeMetricsName = "decode"

  /** [[decodeObserved]] for streaming frames: the `Observation` API is
    * batch-only, so streaming uses the name-based `observe` and readers pull
    * `total`/`malformed` from each micro-batch's
    * `StreamingQueryProgress.observedMetrics(decodeMetricsName)`.
    */
  def decodeNamed(df: DataFrame, valueCol: String = "value"): DataFrame =
    parsed(df, valueCol)
      .observe(decodeMetricsName,
        count(lit(1)).as("total"),
        count(when(col(s"flow.$corruptCol").isNotNull, 1)).as("malformed"))
      .filter(col(s"flow.$corruptCol").isNull)
      .select("flow.*")
      .drop(corruptCol)

  /** [[batch]] with the per-micro-batch decode metrics attached. */
  def batchObserved(raw: DataFrame, valueCol: String = "value"): DataFrame =
    project(decodeNamed(raw, valueCol))

  /** Projection/rename/coerce with Go-zero-value defaults. Layer A4-A6. */
  val projection: Seq[Column] = FlowSchema.mapping.map {
    case (in, out @ ("bytes" | "packets")) =>
      coalesce(col(in), lit(0.0)).cast("long").as(out)
    case (in, out @ ("start" | "end")) =>
      coalesce(col(in), lit(0.0)).as(out)
    case (in, out) =>
      coalesce(col(in), lit("")).as(out)
  }

  def project(parsed: DataFrame): DataFrame = parsed.select(projection: _*)

  /** Full batch pipeline over a text file of newline-delimited flow JSON —
    * the unit the streaming wrapper triggers per micro-batch.
    */
  def batch(raw: DataFrame, valueCol: String = "value"): DataFrame =
    project(decode(raw, valueCol))
}
