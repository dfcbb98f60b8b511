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
}
