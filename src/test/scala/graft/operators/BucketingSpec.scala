package graft.operators

import graft.{SparkSpec, Tables}

class BucketingSpec extends SparkSpec {

  test("bucketed tables join without a shuffle and match the plain join") {
    val li = Tables.lineitem(spark, sf0001)
    val o = Tables.orders(spark, sf0001)
    // unique names: the in-memory catalog dies with the JVM but the warehouse
    // dirs survive, and saveAsTable refuses an orphaned location
    val run = java.util.UUID.randomUUID().toString.take(8)
    val (liB, oB) = (s"li_b_$run", s"o_b_$run")
    Bucketing.writeBucketed(li, liB, "l_orderkey", 8)
    Bucketing.writeBucketed(o, oB, "o_orderkey", 8)

    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.read(spark, liB)
        .join(Bucketing.read(spark, oB),
          spark.table(liB)("l_orderkey") === spark.table(oB)("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      // bucketed scans satisfy the join's distribution: no shuffle exchange
      assert(!plan.contains("Exchange hashpartitioning"))
      assert(joined.count() ==
        li.join(o, li("l_orderkey") === o("o_orderkey")).count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql(s"DROP TABLE IF EXISTS $liB")
      spark.sql(s"DROP TABLE IF EXISTS $oB")
    }
  }

  test("append voids the per-bucket sort contract; compactSorted restores it") {
    import org.apache.spark.sql.functions._
    val run = java.util.UUID.randomUUID().toString.take(8)
    val t = s"ev_sorted_$run"
    val ev = Tables.events(spark, sf0001)
      .select("user_id", "ts", "event_id", "event_type", "value")
    val (day0, day1) = (ev.filter(col("event_id") % 2 === 0),
      ev.filter(col("event_id") % 2 === 1))
    def files(table: String) = {
      val loc = new java.io.File(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"),
        table.toLowerCase)
      loc.listFiles().filter(_.getName.startsWith("part-"))
    }
    def bucketsWithManyFiles(table: String) =
      files(table).map(_.getName.split("_")(1).take(5)).groupBy(identity)
        .count(_._2.length > 1)
    try {
      Bucketing.writeBucketedSorted(day0, t, "user_id",
        Seq("user_id", "ts", "event_id"), 4)
      assert(bucketsWithManyFiles(t) == 0)
      Bucketing.appendBucketed(day1, t, "user_id", 4,
        Seq("user_id", "ts", "event_id"))
      assert(bucketsWithManyFiles(t) > 0, "append should add files per bucket")
      val before = spark.table(t).orderBy("event_id").collect().toSeq
      Bucketing.compactSorted(spark, t, "user_id",
        Seq("user_id", "ts", "event_id"), 4)
      assert(bucketsWithManyFiles(t) == 0, "compaction must restore one file per bucket")
      assert(spark.table(t).orderBy("event_id").collect().toSeq == before,
        "compaction must not change the data")
      // and the restored contract is visible to the planner: a user window
      // over the compacted table plans with no exchange and no sort
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("ts", "event_id")
      val plan = spark.table(t).select(col("user_id"), lag("value", 1).over(w))
        .queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"), plan)
      assert(!plan.contains("Sort ["), plan)
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $t")
    }
  }
}
