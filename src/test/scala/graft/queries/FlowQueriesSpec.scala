package graft.queries

import graft.SparkSpec
import graft.pipeline.FlowPipeline

class FlowQueriesSpec extends SparkSpec {
  import spark.implicits._

  test("B7 ping answers") {
    assert(FlowQueries.ping(spark))
  }

  test("B3 catalog probe returns <= 5 rows with (name, catalog_str)") {
    val rows = FlowQueries.probe(spark)
    assert(rows.columns.toSeq == Seq("name", "catalog_str"))
    assert(rows.count() <= 5)
  }

  test("B1/B2 durable: real DROP/CREATE DDL through the catalog, B6 verification on it") {
    val flows = FlowPipeline.batch(Seq(
      """{"TimeFlowStartMs":1695723032000,"TimeFlowEndMs":1695723032500,"SrcAddr":"10.0.0.1","Bytes":100,"Packets":2}""",
      """{"TimeFlowStartMs":1695723031000,"SrcAddr":"10.0.0.2","Bytes":50,"Packets":1}""").toDF("value"))
    // run twice: the DROP TABLE IF EXISTS + CREATE pair must be idempotent
    FlowQueries.setupTableDurable(spark, flows, "flows_durable")
    FlowQueries.setupTableDurable(spark, flows, "flows_durable")
    assert(spark.catalog.tableExists("flows_durable"))
    val out = FlowQueries.verification(spark, "flows_durable").collect()
    assert(out.length == 2) // second setup dropped the first table's rows
    assert(out(1).getTimestamp(0).toInstant.toString == "2023-09-26T10:10:32Z")
    spark.sql("DROP TABLE IF EXISTS flows_durable")
  }

  test("B1/B2/B6: setup table + verification query over projected flows") {
    val flows = FlowPipeline.batch(Seq(
      """{"TimeFlowStartMs":1695723032000,"TimeFlowEndMs":1695723032500,"SrcAddr":"10.0.0.1","Bytes":100,"Packets":2}""",
      """{"TimeFlowStartMs":1695723031000,"SrcAddr":"10.0.0.2","Bytes":50,"Packets":1}""").toDF("value"))
    FlowQueries.setupTable(spark, flows)
    val out = FlowQueries.verification(spark).collect()
    assert(out.length == 2)
    // intDiv + fromUnixTimestamp semantics: 1695723032000 -> 2023-09-26T10:10:32Z
    assert(out(1).getTimestamp(0).toInstant.toString == "2023-09-26T10:10:32Z")
    assert(out(0).getTimestamp(1).toInstant.toString == "1970-01-01T00:00:00Z") // defaulted end
  }
}
