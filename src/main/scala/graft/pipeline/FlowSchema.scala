package graft.pipeline

import org.apache.spark.sql.types._

/** The NetObserv flow-record schema the reference consumes and the 12-column
  * output schema it writes.
  *
  * Input field names mirror the vendored NetObserv constants
  * (`/root/reference/vendor/.../pkg/model/fields/fields.go:4-43`); the output
  * column names and types mirror the ClickHouse DDL
  * (`/root/reference/pkg/clickhouse/connect.go:74-89`). ClickHouse `UInt32`
  * becomes `LongType` (Spark has no unsigned 32-bit type); epoch-millisecond
  * timestamps stay `DoubleType` exactly like the reference (its author's
  * `TODO: use DateTime` at `connect.go:73` notwithstanding — parity first).
  */
object FlowSchema {
  // Input JSON keys (fields.go:4-43 + literals in export_clickhouse.go:45-48).
  val TimeFlowStartMs = "TimeFlowStartMs"
  val TimeFlowEndMs   = "TimeFlowEndMs"
  val SrcAddr         = "SrcAddr"
  val DstAddr         = "DstAddr"
  val SrcName         = "SrcK8S_Name"
  val DstName         = "DstK8S_Name"
  val SrcType         = "SrcK8S_Type"
  val DstType         = "DstK8S_Type"
  val SrcNamespace    = "SrcK8S_Namespace"
  val DstNamespace    = "DstK8S_Namespace"
  val Bytes           = "Bytes"
  val Packets         = "Packets"

  /** Schema-on-read for the raw JSON: numbers as Double (JSON numbers decode
    * to float64 in the reference, `pkg/kafka/decode_json.go:7-11`), unknown
    * keys ignored by construction.
    */
  val input: StructType = StructType(Seq(
    StructField(TimeFlowStartMs, DoubleType),
    StructField(TimeFlowEndMs, DoubleType),
    StructField(SrcAddr, StringType),
    StructField(DstAddr, StringType),
    StructField(SrcName, StringType),
    StructField(DstName, StringType),
    StructField(SrcType, StringType),
    StructField(DstType, StringType),
    StructField(SrcNamespace, StringType),
    StructField(DstNamespace, StringType),
    StructField(Bytes, DoubleType),
    StructField(Packets, DoubleType)))

  /** Output 12-column schema (`connect.go:74-89`), defaults applied so every
    * column is non-null.
    */
  val output: StructType = StructType(Seq(
    StructField("start", DoubleType, nullable = false),
    StructField("end", DoubleType, nullable = false),
    StructField("src_ip", StringType, nullable = false),
    StructField("dst_ip", StringType, nullable = false),
    StructField("src_name", StringType, nullable = false),
    StructField("dst_name", StringType, nullable = false),
    StructField("src_kind", StringType, nullable = false),
    StructField("dst_kind", StringType, nullable = false),
    StructField("src_namespace", StringType, nullable = false),
    StructField("dst_namespace", StringType, nullable = false),
    StructField("bytes", LongType, nullable = false),
    StructField("packets", LongType, nullable = false)))

  /** input key -> (output column, default). Order = DDL column order. */
  val mapping: Seq[(String, String)] = Seq(
    TimeFlowStartMs -> "start",
    TimeFlowEndMs   -> "end",
    SrcAddr         -> "src_ip",
    DstAddr         -> "dst_ip",
    SrcName         -> "src_name",
    DstName         -> "dst_name",
    SrcType         -> "src_kind",
    DstType         -> "dst_kind",
    SrcNamespace    -> "src_namespace",
    DstNamespace    -> "dst_namespace",
    Bytes           -> "bytes",
    Packets         -> "packets")

  /** NetObserv field taxonomy helpers (vendored `fields.go:45-74`). */
  def isNumeric(field: String): Boolean =
    Set(Bytes, Packets, TimeFlowStartMs, TimeFlowEndMs, "Proto", "SrcPort", "DstPort").contains(field)

  def isIP(field: String): Boolean = Set(SrcAddr, DstAddr).contains(field)
}
