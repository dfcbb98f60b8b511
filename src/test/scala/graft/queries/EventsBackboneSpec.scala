package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** The staged events tables are a PHYSICAL rearrangement only: same rows,
  * same values, plus the layout contract (one file per bucket, in-bucket
  * sort) the sort-elision depends on. PlanAuditSpec pins the plans; this
  * spec pins the data and the layout.
  */
class EventsBackboneSpec extends SparkSpec {

  private def canon(df: org.apache.spark.sql.DataFrame) =
    df.select("event_id", "ts", "user_id", "event_type", "value", "props")
      .orderBy("event_id").collect().toSeq

  test("staged events equal the raw table row-for-row (both keys)") {
    val raw = canon(Tables.events(spark, sf0001))
    assert(raw.nonEmpty)
    assert(canon(EventsBackbone.byUser(spark, sf0001)) == raw)
    assert(canon(EventsBackbone.byType(spark, sf0001)) == raw)
  }

  test("staged layout holds the single-file-per-bucket sorted contract") {
    // one file per bucket is the condition under which the scan reports
    // its sort order (GraftSession enables the reporting conf); verify it
    // on disk rather than trusting the writer
    EventsBackbone.byUser(spark, sf0001).count() // force staging
    val warehouse = spark.conf.get("spark.sql.warehouse.dir")
    // graft_ev_zlc_* is the q105 zone-INGEST table: it ends the flow in the
    // append-degraded state on purpose (bucket pruning survives, sort
    // reporting doesn't), so the sorted single-file contract excludes it
    val dirs = new java.io.File(warehouse.stripPrefix("file:")).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("graft_ev_")
        && !f.getName.startsWith("graft_ev_zlc_"))
    assert(dirs.nonEmpty)
    dirs.foreach { d =>
      val parts = d.listFiles().filter(_.getName.startsWith("part-"))
      val buckets = parts.map(_.getName.split("_")(1).take(5))
      assert(buckets.distinct.length == buckets.length,
        s"${d.getName} has a bucket with >1 file — sort reporting voids")
    }
  }

  test("zone-clustered events equal the raw table, zones derive from ts") {
    val z = EventsBackbone.byZone(spark, sf0001)
    assert(canon(z) == canon(Tables.events(spark, sf0001)))
    // the staged zone column must equal its defining expression row-for-row
    assert(z.filter(col("zone") =!=
      expr(s"unix_micros(ts) div ${EventsBackbone.zoneMicros}")).count() == 0)
  }

  test("q101 zone-pruned answer equals the raw full-scan answer, and prunes") {
    val r = CoreQueries.q101(spark, sf0001).collect().head
    val (zonesTotal, zonesScanned) = (r.getLong(0), r.getLong(1))
    assert(zonesScanned < zonesTotal,
      s"zone map pruned nothing: $zonesScanned of $zonesTotal")
    val raw = Tables.events(spark, sf0001)
      .filter(unix_micros(col("ts")) >= CoreQueries.q101LoUs &&
        unix_micros(col("ts")) < CoreQueries.q101HiUs)
      .agg(count(lit(1)), round(sum(col("value").cast("decimal(28,6)"))
        .cast("double"), 6))
      .collect().head
    assert((r.getLong(2), r.getDouble(3)) == ((raw.getLong(0), raw.getDouble(1))))
  }

  test("q105: zone pruning survives the append, and the batch is visible") {
    val r = CoreQueries.q105(spark, sf0001).collect().head
    assert(r.getLong(1) < r.getLong(0),
      s"appended zone map pruned nothing: ${r.getLong(1)} of ${r.getLong(0)}")
    // the window crosses the ingest cutoff: rows past it can only come from
    // the appended batch, so a dropped append under-counts vs the raw scan
    val raw = Tables.events(spark, sf0001)
      .filter(unix_micros(col("ts")) >= CoreQueries.q105LoUs &&
        unix_micros(col("ts")) < CoreQueries.q105HiUs)
    val postCutoff = raw
      .filter(unix_micros(col("ts")) >= EventsBackbone.lifecycleCutoffUs).count()
    assert(postCutoff > 0, "fixture has no post-cutoff rows in the window")
    assert(r.getLong(2) == raw.count())
    // and the pruned read still bucket-prunes on the appended table
    val plan = CoreQueries.q105(spark, sf0001).queryExecution.executedPlan.toString
    val m = "SelectedBucketsCount: (\\d+) out of (\\d+)".r.findFirstMatchIn(plan)
    assert(m.isDefined && m.get.group(1).toInt < m.get.group(2).toInt, plan)
  }

  test("in-bucket rows really are sorted by (user_id, ts, event_id)") {
    // read ONE bucket file directly and check monotonicity — the physical
    // guarantee the window relies on, independent of Spark's planner
    import spark.implicits._
    val warehouse = spark.conf.get("spark.sql.warehouse.dir")
    val userDir = new java.io.File(warehouse.stripPrefix("file:")).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("graft_ev_user_"))
      .maxBy(_.lastModified)
    val aFile = userDir.listFiles().filter(_.getName.startsWith("part-")).head
    val rows = spark.read.parquet(aFile.getAbsolutePath)
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_id"))
      .as[(Long, Long, Long)].collect().toSeq
    assert(rows.nonEmpty)
    assert(rows == rows.sortBy(identity),
      "bucket file is not sorted by (user_id, ts, event_id)")
  }

  test("q107: dynamic partition pruning MEASURED — fewer day partitions read than exist") {
    // the plan audit pins the DynamicPruningExpression's presence; this
    // executes the query and reads the fact scan's runtime metrics, so the
    // claim is "directories were actually skipped", not "the plan says so"
    import graft.queries.CoreQueries
    val df = CoreQueries.q107(spark, sf0001)
    val answer = df.collect()
    assert(answer.nonEmpty, "no weekend rows — vacuous pruning test")
    val (factPath, _) = EventsBackbone.dayPartitioned(spark, sf0001)
    val totalDays = new java.io.File(factPath).listFiles()
      .count(f => f.isDirectory && f.getName.startsWith("day="))
    assert(totalDays > 2, s"corpus spans only $totalDays days")
    // AQE hides scans inside query stages: collect() does not descend into
    // QueryStageExec.plan / AdaptiveSparkPlanExec.executedPlan, so walk them
    def allNodes(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] = {
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      val nested = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case _ => Nil
      }
      p +: (p.children ++ nested).flatMap(allNodes)
    }
    val scans = allNodes(df.queryExecution.executedPlan).collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec
          if s.partitionFilters.nonEmpty => s
    }
    assert(scans.nonEmpty, df.queryExecution.executedPlan.toString)
    val read = scans.head.metrics("numPartitions").value
    assert(read > 0 && read < totalDays,
      s"fact scan read $read of $totalDays day partitions — DPP did not prune")
    // and the pruned answer equals the unpruned predicate pushed by hand
    val expect = Tables.events(spark, sf0001)
      .filter(dayofweek(to_date(col("ts"))).isin(1, 7))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), countDistinct("user_id").as("users"),
        min("event_id").as("min_id"), max("event_id").as("max_id"))
      .orderBy("event_type").collect()
    assert(answer.toSeq == expect.toSeq)
  }
}
