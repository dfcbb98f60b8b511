package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class QuantilesSpec extends SparkSpec {
  import spark.implicits._

  test("selection quantiles equal the built-in percentile aggregate exactly") {
    val li = Tables.lineitem(spark, sf0001).select(col("l_extendedprice").as("v"))
    val qs = Seq(0.2, 0.4, 0.5, 0.6, 0.8, 0.99)
    val got = Quantiles.exactQuantiles(li, "v", qs)
    val exp = li.agg(expr(s"percentile(v, array(${qs.mkString(",")}))"))
      .head().getSeq[Double](0)
    assert(got.toSeq === exp.toSeq)
  }

  test("extremes hit min and max; a one-row frame returns that row everywhere") {
    val df = Seq(5.0, 1.0, 9.0, 3.0).toDF("v")
    val got = Quantiles.exactQuantiles(df, "v", Seq(0.0, 1.0))
    assert(got.toSeq === Seq(1.0, 9.0))
    val one = Seq(42.0).toDF("v")
    assert(Quantiles.exactQuantiles(one, "v", Seq(0.0, 0.5, 1.0)).toSeq ===
      Seq(42.0, 42.0, 42.0))
  }

  test("ties and empty range partitions don't shift ranks") {
    // heavy ties + fewer distinct values than partitions
    val df = (0 until 1000).map(i => (i % 3).toDouble).toDF("v")
    val got = Quantiles.exactQuantiles(df, "v", Seq(0.5), parts = 32)
    val exp = df.agg(expr("percentile(v, 0.5)")).head().getDouble(0)
    assert(got(0) === exp)
  }

  test("nulls are skipped like the aggregate skips them") {
    val df = Seq[Option[Double]](Some(1.0), None, Some(3.0), None, Some(2.0)).toDF("v")
    val got = Quantiles.exactQuantiles(df, "v", Seq(0.5))
    assert(got(0) === 2.0)
  }

  test("empty input yields NaN, not an exception") {
    val df = Seq.empty[Double].toDF("v")
    assert(Quantiles.exactQuantiles(df, "v", Seq(0.5)).forall(_.isNaN))
  }
}
