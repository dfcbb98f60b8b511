package graft.pipeline

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Property tests (SURVEY §5 item 2): arbitrary JSON objects — missing keys,
  * extra keys, extreme numbers — never crash the pipeline, always produce the
  * fixed output schema, and obey the zero-value defaults law. Generators are
  * driven with fixed seeds (no scalatest+scalacheck bridge in the offline
  * dependency set), so failures reproduce exactly.
  */
class FlowPipelinePropertySpec extends SparkSpec {
  import spark.implicits._

  private val knownNumeric = Gen.oneOf(FlowSchema.TimeFlowStartMs, FlowSchema.TimeFlowEndMs,
    FlowSchema.Bytes, FlowSchema.Packets)
  private val knownString = Gen.oneOf(FlowSchema.SrcAddr, FlowSchema.DstAddr,
    FlowSchema.SrcName, FlowSchema.DstName, FlowSchema.SrcType, FlowSchema.DstType,
    FlowSchema.SrcNamespace, FlowSchema.DstNamespace)

  private val numberJson: Gen[String] = Gen.oneOf(
    Gen.chooseNum(-1e12, 1e12).map(d => f"$d%.3f"),
    Gen.chooseNum(Long.MinValue / 4, Long.MaxValue / 4).map(_.toString))
  private val stringJson: Gen[String] =
    Gen.alphaNumStr.map(s => "\"" + s.take(20) + "\"")

  private val field: Gen[(String, String)] = Gen.oneOf(
    knownNumeric.flatMap(k => numberJson.map(k -> _)),
    knownString.flatMap(k => stringJson.map(k -> _)),
    Gen.alphaLowerStr.flatMap(k =>
      Gen.oneOf(numberJson, stringJson, Gen.const("{\"nested\":1}"), Gen.const("[1,2]"))
        .map(("extra_" + k.take(10)) -> _)))

  private val objectJson: Gen[String] =
    Gen.listOfN(6, field).map(fs =>
      fs.toMap.map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}"))

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (1 to n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("pipeline never throws, schema is invariant, defaults law holds") {
    val docs = samples(objectJson, 60)
    assert(docs.size >= 50)
    val out = FlowPipeline.batch(docs.toDF("value"))
    assert(out.schema.fieldNames.toSeq == FlowSchema.output.fieldNames.toSeq)
    val rows = out.collect() // must not throw
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // defaults law: nothing is ever null after projection
      (0 until r.length).foreach(i => assert(!r.isNullAt(i)))
    }
  }

  test("rows with only unknown keys become all-default rows") {
    val keyLists = samples(Gen.listOfN(4, Gen.alphaLowerStr.map("x_" + _.take(8))), 20)
    keyLists.foreach { keys =>
      val doc = keys.map(k => s""""$k":1""").mkString("{", ",", "}")
      val r = FlowPipeline.batch(Seq(doc).toDF("value")).collect().head
      assert(r.getDouble(0) == 0.0 && r.getString(2) == "" && r.getLong(10) == 0L)
    }
  }
}
