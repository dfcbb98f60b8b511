package graft.expressions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

import graft.{SparkSpec, Tables}

class FreqItemsAggSpec extends SparkSpec {

  private def freqItems(k: Int) = ColumnBridge.column(
    FreqItemsAgg(ColumnBridge.expression(col("token")), k).toAggregateExpression())

  private def sketch(df: org.apache.spark.sql.DataFrame, k: Int): Map[String, Long] =
    df.agg(freqItems(k).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.token"), col("e.cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("exact regime: counts equal groupBy counts on the real corpus") {
    val toks = Tables.documents(spark, sf0001)
      .select(explode(split(lower(col("text")), " ")).as("token"))
      .filter(col("token") =!= "")
    val exact = toks.groupBy("token").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(exact.size <= 64, "fixture assumption: corpus vocab fits the sketch")
    assert(sketch(toks, 64) == exact)
  }

  test("exact-regime result is invariant under repartitioning (merge path)") {
    val toks = Tables.documents(spark, sf0001)
      .select(explode(split(lower(col("text")), " ")).as("token"))
      .filter(col("token") =!= "")
    assert(sketch(toks, 64) == sketch(toks.repartition(16), 64))
  }

  test("beyond capacity: MG bound holds and the guaranteed-heavy item survives") {
    import spark.implicits._
    // 1 item with 400 occurrences + 200 singletons, capacity 8:
    // n = 600, bound = n/(k+1) = 66.7 -> "hot" (400 > bound) must survive,
    // and every reported count is an underestimate by at most the bound.
    val rows = Seq.fill(400)("hot") ++ (0 until 200).map(i => f"rare_$i%03d")
    val toks = rows.toDF("token").repartition(4)
    val truth = rows.groupBy(identity).map { case (t, v) => t -> v.size.toLong }
    val est = sketch(toks, 8)
    val n = rows.size.toDouble
    val bound = n / (8 + 1)
    assert(est.contains("hot"), s"guaranteed heavy hitter lost: $est")
    est.foreach { case (t, c) =>
      val truec = truth(t)
      assert(c <= truec, s"$t overestimated: $c > $truec")
      assert(truec - c <= bound, s"$t underestimated past the MG bound")
    }
  }

  test("graft_freq_items from SQL matches the DataFrame aggregate") {
    val toks = Tables.documents(spark, sf0001)
      .select(explode(split(lower(col("text")), " ")).as("token"))
      .filter(col("token") =!= "")
    toks.createOrReplaceTempView("fi_toks")
    val viaSql = spark.sql(
      """SELECT e.token, e.cnt FROM
        | (SELECT explode(graft_freq_items(token, 64)) AS e FROM fi_toks) t
        |""".stripMargin)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viaSql == sketch(toks, 64))
  }

  test("arity and non-literal capacity raise usable messages") {
    val e1 = intercept[Exception](spark.sql("SELECT graft_freq_items('a') FROM range(1)"))
    assert(e1.getMessage.contains("graft_freq_items"))
    val e2 = intercept[Exception](
      spark.sql("SELECT graft_freq_items('a', CAST(id AS INT)) FROM range(1)"))
    assert(e2.getMessage.contains("capacity"))
  }
}
