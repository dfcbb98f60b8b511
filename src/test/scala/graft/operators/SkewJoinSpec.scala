package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class SkewJoinSpec extends SparkSpec {

  test("salted join returns exactly the rows of the plain join") {
    val li = Tables.lineitem(spark, sf0001)
    val o = Tables.orders(spark, sf0001)
    val plain = li.join(o, li("l_orderkey") === o("o_orderkey"))
      .groupBy("o_orderstatus").agg(count(lit(1)).as("c"))
      .orderBy("o_orderstatus").collect().toSeq
    val salted = SkewJoin.saltedInnerJoin(li, o, li("l_orderkey"), o("o_orderkey"), saltFactor = 4)
      .groupBy("o_orderstatus").agg(count(lit(1)).as("c"))
      .orderBy("o_orderstatus").collect().toSeq
    assert(salted == plain)
  }

  test("registerAll exposes every table to spark.sql") {
    Tables.registerAll(spark, sf0001)
    val n = spark.sql(
      "SELECT count(*) FROM lineitem JOIN orders ON l_orderkey = o_orderkey").collect().head.getLong(0)
    assert(n == 6000L)
    assert(spark.sql("SELECT max(ts) FROM events").collect().head.get(0) != null)
  }
}
