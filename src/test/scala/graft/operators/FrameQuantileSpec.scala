package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** [[FrameQuantile]] is a CONSTANT-factor rewrite of `percentile(x, 0.5)`
  * inside a bounded frame — it must reproduce the aggregate's doubles
  * BIT-FOR-BIT (same `lo + (hi − lo) * frac` interpolation), not merely to
  * a rounding tolerance, on real data and on the tie/negative/odd-even
  * boundary fixtures where a `(lo + hi) / 2` shortcut would round
  * differently.
  */
class FrameQuantileSpec extends SparkSpec {

  private def bothMedians(df: DataFrame, n: Int): DataFrame = {
    val w = Window.partitionBy("k").orderBy("ts", "id").rowsBetween(-n, -1)
    df.withColumn("agg_med", expr("percentile(v, 0.5)").over(w))
      .withColumn("arr_med",
        FrameQuantile.medianOfSorted(FrameQuantile.sortedFrame(col("v"))(w)))
  }

  private def assertBitEqual(df: DataFrame, n: Int): Unit = {
    val rows = bothMedians(df, n)
      .select(col("agg_med"), col("arr_med")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      (r.isNullAt(0), r.isNullAt(1)) match {
        case (true, true) => ()
        case (false, false) =>
          // bit-level compare: 0.0 vs -0.0 or a 1-ulp drift must fail
          assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ==
            java.lang.Double.doubleToRawLongBits(r.getDouble(1)),
            s"median drift: agg=${r.getDouble(0)} arr=${r.getDouble(1)}")
        case other => fail(s"null-shape mismatch: $other")
      }
    }
  }

  test("bit-parity with the percentile aggregate on real event values") {
    val ev = Tables.events(spark, sf0001)
      .select(col("event_type").as("k"), col("ts"),
        col("event_id").as("id"), col("value").as("v"))
    assertBitEqual(ev, 20)
    assertBitEqual(ev, 7) // odd depth: frames alternate odd/even sizes
  }

  test("bit-parity on ties, negatives, tiny magnitudes, and odd/even frames") {
    val fixture = spark.range(400).selectExpr(
      "concat('k', cast(id % 2 AS string)) AS k",
      "timestamp_micros(1700000000000000 + id * 1000000) AS ts",
      "id",
      // heavy ties (mod 5), sign flips, and subnormal-ish magnitudes where
      // (lo+hi)/2 and lo+(hi-lo)*0.5 round differently if the formula drifts
      """CASE WHEN id % 7 = 0 THEN -4.9e-324 * (id % 3 + 1)
        |     WHEN id % 3 = 0 THEN -cast(id % 5 AS DOUBLE) / 3
        |     ELSE cast(id % 5 AS DOUBLE) + 0.1 END""".stripMargin + " AS v")
    for (n <- Seq(1, 2, 3, 20)) assertBitEqual(fixture, n)
  }

  test("empty frame yields null, never an ANSI index error") {
    val one = spark.sql(
      """SELECT 'a' AS k, timestamp_micros(0) AS ts, 1L AS id, 1.0 AS v""")
    val w = Window.partitionBy("k").orderBy("ts", "id").rowsBetween(-5, -1)
    val r = one.select(
      FrameQuantile.medianOfSorted(FrameQuantile.sortedFrame(col("v"))(w))
        .as("m")).collect()
    assert(r.length == 1 && r.head.isNullAt(0))
  }

  test("size of the sorted frame equals count(value) — the roll_n contract") {
    val ev = Tables.events(spark, sf0001)
      .select(col("event_type").as("k"), col("ts"),
        col("event_id").as("id"), col("value").as("v"))
    val w = Window.partitionBy("k").orderBy("ts", "id").rowsBetween(-20, -1)
    val bad = ev
      .withColumn("n1", count("v").over(w))
      .withColumn("n2", size(FrameQuantile.sortedFrame(col("v"))(w)))
      .filter(col("n1") =!= col("n2")).count()
    assert(bad == 0L)
  }
}
