package graft.operators

import graft.{SparkSpec, Tables}

class BucketingSpec extends SparkSpec {

  test("bucketed tables join without a shuffle and match the plain join") {
    val li = Tables.lineitem(spark, sf0001)
    val o = Tables.orders(spark, sf0001)
    Bucketing.writeBucketed(li, "li_b", "l_orderkey", 8)
    Bucketing.writeBucketed(o, "o_b", "o_orderkey", 8)

    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.read(spark, "li_b")
        .join(Bucketing.read(spark, "o_b"),
          spark.table("li_b")("l_orderkey") === spark.table("o_b")("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      // bucketed scans satisfy the join's distribution: no shuffle exchange
      assert(!plan.contains("Exchange hashpartitioning"))
      assert(joined.count() ==
        li.join(o, li("l_orderkey") === o("o_orderkey")).count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
