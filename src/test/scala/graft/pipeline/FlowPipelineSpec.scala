package graft.pipeline

import org.apache.spark.sql.{Observation, Row}

import graft.SparkSpec

/** Unit tests for SURVEY Layer A semantics (A2-A6), mirroring FIXTURES §1. */
class FlowPipelineSpec extends SparkSpec {
  import spark.implicits._

  private val full =
    """{"TimeFlowStartMs":1695723032000,"TimeFlowEndMs":1695723032500,
      |"SrcAddr":"10.128.2.13","DstAddr":"10.128.2.10",
      |"SrcK8S_Name":"prometheus-k8s-0","DstK8S_Name":"router-default",
      |"SrcK8S_Type":"Pod","DstK8S_Type":"Pod",
      |"SrcK8S_Namespace":"openshift-monitoring","DstK8S_Namespace":"openshift-ingress",
      |"Bytes":2649,"Packets":1,"Proto":6,"IgnoredExtraField":"x"}""".stripMargin.replaceAll("\n", "")
  private val partial = """{"TimeFlowStartMs":1695723031000,"SrcAddr":"10.0.144.30","Bytes":66.9}"""
  private val malformed = "not-json{{{"

  private def run(lines: String*) =
    FlowPipeline.batch(lines.toDF("value"))

  test("complete record: 12 fields extracted, extra keys ignored") {
    val rows = run(full).collect()
    assert(rows.length == 1)
    assert(rows.head == Row(
      1695723032000.0, 1695723032500.0, "10.128.2.13", "10.128.2.10",
      "prometheus-k8s-0", "router-default", "Pod", "Pod",
      "openshift-monitoring", "openshift-ingress", 2649L, 1L))
  }

  test("missing fields default to Go zero values; Bytes truncates 66.9 -> 66") {
    val r = run(partial).collect().head
    assert(r == Row(1695723031000.0, 0.0, "10.0.144.30", "", "", "", "", "", "", "", 66L, 0L))
  }

  test("malformed JSON dropped, stream continues (ingest_kafka.go:40-44)") {
    assert(run(full, malformed, partial).count() == 2)
  }

  test("decodeObserved counts total and malformed records") {
    val obs = Observation("decode")
    val df = FlowPipeline.decodeObserved(Seq(full, malformed, partial).toDF("value"), obs)
    df.collect()
    val m = obs.get
    assert(m("total") == 3L && m("malformed") == 1L)
  }

  test("empty object -> all-defaults row (valid JSON, no keys)") {
    val r = run("{}").collect().head
    assert(r == Row(0.0, 0.0, "", "", "", "", "", "", "", "", 0L, 0L))
  }

  test("wrong-typed present field -> bad-record drop, not crash (improvement over reference panic)") {
    // Reference: unchecked v.(string) assertion panics the whole consumer
    // (export_clickhouse.go:45-79). Here: an uncoercible field marks the
    // record corrupt and it is dropped+counted; a coercible one (number where
    // string expected) is accepted.
    assert(run("""{"TimeFlowStartMs":1.0,"Bytes":"notanumber"}""").count() == 0)
    val r = run("""{"TimeFlowStartMs":1.0,"SrcAddr":123}""").collect().head
    assert(r.getString(2) == "123")
  }

  test("negative fractional bytes truncate toward zero like Go int()") {
    val r = run("""{"Bytes":-1.9}""").collect().head
    assert(r.getLong(10) == -1L)
  }

  test("field taxonomy helpers mirror the vendored fields.go predicates") {
    assert(FlowSchema.isNumeric(FlowSchema.Bytes) && FlowSchema.isNumeric("Proto"))
    assert(!FlowSchema.isNumeric(FlowSchema.SrcAddr))
    assert(FlowSchema.isIP(FlowSchema.SrcAddr) && FlowSchema.isIP(FlowSchema.DstAddr))
    assert(!FlowSchema.isIP(FlowSchema.SrcName))
  }

  test("output schema matches the ClickHouse DDL mapping (connect.go:74-89)") {
    val got = run(full).schema
    assert(got.fieldNames.toSeq == FlowSchema.output.fieldNames.toSeq)
    assert(got.fields.map(_.dataType).toSeq == FlowSchema.output.fields.map(_.dataType).toSeq)
  }
}
