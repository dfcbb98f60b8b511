package graft.sinks

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.DataFrame

import graft.SparkSpec
import graft.app.FlowApp
import graft.pipeline.FlowPipeline
import graft.sources.MemoryFlowSource

class FlowSinkSpec extends SparkSpec {

  private def flowJson(startMs: Long, src: String): String =
    s"""{"TimeFlowStartMs":$startMs,"TimeFlowEndMs":${startMs + 500},"SrcAddr":"$src","Bytes":1,"Packets":1}"""

  test("sink selection mirrors the reference: jdbc > parquet > console") {
    assert(FlowApp.chooseSink("jdbc:ch://host/db", "").isInstanceOf[JdbcSink])
    assert(FlowApp.chooseSink("jdbc:ch://host/db", "/out").isInstanceOf[JdbcSink])
    assert(FlowApp.chooseSink("", "/out").isInstanceOf[ParquetSink])
    assert(FlowApp.chooseSink("", "").isInstanceOf[ConsoleSink])
    // the recreate decision reaches the sink (a resume must not drop rows)
    assert(!FlowApp.chooseSink("jdbc:ch://host/db", "", recreate = false)
      .asInstanceOf[JdbcSink].recreate)
    // --upsertkeys flips the JDBC sink into keyed-upsert mode
    val up = FlowApp.chooseSink("jdbc:ch://host/db", "",
      upsertKeys = Seq("start", "src_ip"))
    assert(up.isInstanceOf[UpsertJdbcSink])
    assert(up.asInstanceOf[UpsertJdbcSink].keyCols == Seq("start", "src_ip"))
  }

  test("deriveRecreate: fresh checkpoint dir recreates, populated one resumes") {
    val fresh = java.nio.file.Files.createTempDirectory("ckpt-fresh")
    assert(FlowApp.deriveRecreate(fresh.toString))         // empty dir
    assert(FlowApp.deriveRecreate(fresh.toString + "-absent")) // missing dir
    java.nio.file.Files.createFile(fresh.resolve("offsets"))
    assert(!FlowApp.deriveRecreate(fresh.toString))        // committed state
  }

  test("JdbcSink: one setup overwrite at start, append per batch — never DDL mid-stream") {
    val writes = ArrayBuffer.empty[(String, Long)] // (mode, rowCount)
    val sink = JdbcSink("jdbc:unused://", writerOverride =
      Some((b: DataFrame, mode: String) => writes.synchronized { writes += mode -> b.count() }))
    val src = new MemoryFlowSource(spark)
    src.add(flowJson(1000, "a"))
    val q = sink.start(FlowPipeline.batch(src.stream(spark)),
      java.nio.file.Files.createTempDirectory("ckpt").toString)
    try {
      q.processAllAvailable()
      src.add(flowJson(2000, "b"))
      q.processAllAvailable()
      assert(writes.head == ("overwrite" -> 0L)) // DDL step carries no data
      assert(writes.tail.forall(_._1 == "append"))
      assert(writes.map(_._2).sum == 2L)
    } finally q.stop()
  }

  test("JdbcSink restart semantics: recreate=false resumes with appends only") {
    val ckpt = java.nio.file.Files.createTempDirectory("ckpt").toString
    val first = ArrayBuffer.empty[String]
    val src = new MemoryFlowSource(spark)
    src.add(flowJson(1000, "a"))
    val q1 = JdbcSink("jdbc:unused://", writerOverride =
      Some((_: DataFrame, mode: String) => first.synchronized { first += mode })).start(
      FlowPipeline.batch(src.stream(spark)), ckpt)
    try q1.processAllAvailable() finally q1.stop()
    assert(first.toSeq == Seq("overwrite", "append"))

    // resume from the same checkpoint (same source, new offsets): no DDL
    val resumed = ArrayBuffer.empty[String]
    src.add(flowJson(2000, "b"))
    val q2 = JdbcSink("jdbc:unused://", recreate = false, writerOverride =
      Some((_: DataFrame, mode: String) => resumed.synchronized { resumed += mode })).start(
      FlowPipeline.batch(src.stream(spark)), ckpt)
    try {
      q2.processAllAvailable()
      assert(resumed.nonEmpty && resumed.forall(_ == "append"))
    } finally q2.stop()
  }

  test("JdbcSink end-to-end on embedded Derby: real DDL, batched appends, restart keeps rows") {
    // No writerOverride: this drives Spark's genuine format("jdbc") writer —
    // DDL (overwrite of the empty frame = DROP + CREATE, reserved-word
    // columns like "end" quoted by the dialect), per-micro-batch batched
    // INSERT, and checkpoint resume — against the Derby engine that ships in
    // the Spark distribution. Exactly the path a ClickHouse driver jar would
    // take; only the URL and driver class differ.
    val url = "jdbc:derby:memory:graftflows;create=true"
    val opts = Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver")
    def readBack(): DataFrame = spark.read.format("jdbc")
      .option("url", url).option("dbtable", "flows").options(opts).load()

    val ckpt = java.nio.file.Files.createTempDirectory("ckpt").toString
    val src = new MemoryFlowSource(spark)
    src.add(flowJson(1000, "10.0.0.1"))
    src.add(flowJson(2000, "10.0.0.2"))
    val q1 = JdbcSink(url, options = opts)
      .start(FlowPipeline.batch(src.stream(spark)), ckpt)
    try q1.processAllAvailable() finally q1.stop()
    assert(readBack().count() == 2)

    // restart from the same checkpoint with recreate=false (the resume path
    // FlowApp now derives): committed rows survive, new data appends once.
    src.add(flowJson(3000, "10.0.0.3"))
    val q2 = JdbcSink(url, options = opts, recreate = false)
      .start(FlowPipeline.batch(src.stream(spark)), ckpt)
    try q2.processAllAvailable() finally q2.stop()
    val rows = readBack()
    assert(rows.count() == 3)
    assert(rows.select("src_ip").collect().map(_.getString(0)).sorted.toSeq ==
      Seq("10.0.0.1", "10.0.0.2", "10.0.0.3"))
    // and a fresh-start recreate=true drops the committed rows by design
    val q3 = JdbcSink(url, options = opts)
      .start(FlowPipeline.batch(new MemoryFlowSource(spark).stream(spark)),
        java.nio.file.Files.createTempDirectory("ckpt").toString)
    try q3.processAllAvailable() finally q3.stop()
    assert(readBack().count() == 0)
  }

  test("UpsertJdbcSink on Derby: replayed data converges by key instead of duplicating") {
    val url = "jdbc:derby:memory:graftupsert;create=true"
    val opts = Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver")
    def readBack(): DataFrame = spark.read.format("jdbc")
      .option("url", url).option("dbtable", "flows").options(opts).load()
    def bytesJson(startMs: Long, src: String, bytes: Long): String =
      s"""{"TimeFlowStartMs":$startMs,"TimeFlowEndMs":${startMs + 500},"SrcAddr":"$src","Bytes":$bytes,"Packets":1}"""

    val sink = UpsertJdbcSink(url, keyCols = Seq("start", "src_ip"), options = opts)
    val src1 = new MemoryFlowSource(spark)
    src1.add(bytesJson(1000, "10.0.0.1", 100), bytesJson(2000, "10.0.0.2", 200))
    val q1 = sink.start(FlowPipeline.batch(src1.stream(spark)),
      java.nio.file.Files.createTempDirectory("ckpt").toString)
    try q1.processAllAvailable() finally q1.stop()
    assert(readBack().count() == 2)

    // full replay from a FRESH checkpoint (the at-least-once worst case:
    // every batch redelivered). Append would double the table; upsert
    // converges — same 2 keys, and the changed payload takes effect.
    val src2 = new MemoryFlowSource(spark)
    src2.add(bytesJson(1000, "10.0.0.1", 999), bytesJson(2000, "10.0.0.2", 200))
    val q2 = sink.start(FlowPipeline.batch(src2.stream(spark)),
      java.nio.file.Files.createTempDirectory("ckpt").toString)
    try q2.processAllAvailable() finally q2.stop()
    // (filters evaluated driver-side: Derby can't compare pushed-down
    // predicates against its CLOB-mapped string columns)
    val rows = readBack().select("src_ip", "bytes").collect()
      .map(r => r.getString(0) -> r.getLong(1))
    assert(rows.length == 2, "replay must not duplicate")
    assert(rows.toMap.apply("10.0.0.1") == 999L, "replayed key carries the new payload")

    // within-batch duplicate keys are deduplicated before the transaction
    val src3 = new MemoryFlowSource(spark)
    src3.add(bytesJson(3000, "10.0.0.3", 1), bytesJson(3000, "10.0.0.3", 2))
    val q3 = sink.start(FlowPipeline.batch(src3.stream(spark)),
      java.nio.file.Files.createTempDirectory("ckpt").toString)
    try q3.processAllAvailable() finally q3.stop()
    assert(readBack().select("src_ip").collect()
      .count(_.getString(0) == "10.0.0.3") == 1)
  }

  test("streaming materialized view: windowed aggregates upserted by key converge across restarts") {
    import org.apache.spark.sql.functions.col
    val url = "jdbc:derby:memory:graftmv;create=true"
    val opts = Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver")
    def view(src: MemoryFlowSource) =
      graft.streaming.StreamOps.trafficPerWindow(FlowPipeline.batch(src.stream(spark)))
        .select(col("window.start").as("win_start"),
          col("src_namespace"), col("dst_namespace"),
          col("bytes"), col("flows"))
    val sink = UpsertJdbcSink(url,
      keyCols = Seq("win_start", "src_namespace", "dst_namespace"),
      table = "traffic_mv", options = opts, outputMode = Some("update"))
    def readBack(): Seq[(Long, Long)] = spark.read.format("jdbc")
      .option("url", url).option("dbtable", "traffic_mv").options(opts).load()
      .select("bytes", "flows").collect().map(r => r.getLong(0) -> r.getLong(1)).toSeq

    def flow(ms: Long, bytes: Long): String =
      s"""{"TimeFlowStartMs":$ms,"TimeFlowEndMs":${ms + 1},"SrcK8S_Namespace":"ns","DstK8S_Namespace":"ns","Bytes":$bytes,"Packets":1}"""

    val ckpt = java.nio.file.Files.createTempDirectory("ckpt").toString
    val src1 = new MemoryFlowSource(spark)
    src1.add(flow(60000, 10), flow(61000, 20)) // same 1-min window
    val q1 = sink.start(view(src1), ckpt)
    try q1.processAllAvailable() finally q1.stop()
    assert(readBack() == Seq((30L, 2L)))

    // more data lands in the SAME window after a restart: update mode
    // re-emits the revised aggregate and the upsert REPLACES the row — the
    // table stays one row per key, now with the converged totals. An append
    // sink would have accumulated stale partial aggregates alongside.
    val src2 = new MemoryFlowSource(spark)
    src2.add(flow(60000, 10), flow(61000, 20))
    src2.add(flow(62000, 5))
    val q2 = sink.copy(recreate = false).start(view(src2),
      java.nio.file.Files.createTempDirectory("ckpt").toString)
    try q2.processAllAvailable() finally q2.stop()
    assert(readBack() == Seq((35L, 3L)), "one row per window key, converged totals")
  }

  test("JdbcSink setup failure is non-fatal (append creates a missing table)") {
    val writes = ArrayBuffer.empty[String]
    val sink = JdbcSink("jdbc:unused://", writerOverride = Some {
      (_: DataFrame, mode: String) =>
        writes.synchronized { writes += mode }
        if (mode == "overwrite") throw new RuntimeException("no ddl rights")
    })
    val src = new MemoryFlowSource(spark)
    src.add(flowJson(1000, "a"))
    val q = sink.start(FlowPipeline.batch(src.stream(spark)),
      java.nio.file.Files.createTempDirectory("ckpt").toString)
    try {
      q.processAllAvailable()
      assert(q.isActive)
      assert(writes.toSeq == Seq("overwrite", "append"))
    } finally q.stop()
  }
}
