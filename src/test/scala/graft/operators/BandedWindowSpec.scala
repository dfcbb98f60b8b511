package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[BandedWindow]] must equal the flat per-key window BIT-FOR-BIT — it is a
  * parallelism rewrite, not an approximation — including across sparse and
  * empty bands, where a frame entering a band must reach back through however
  * many near-empty bands it takes to fill n rows (the carry-ordinal
  * arithmetic this operator exists for).
  */
class BandedWindowSpec extends SparkSpec {

  /** A spiky synthetic stream: 3 keys, bursts separated by multi-band gaps,
    * several bands with fewer than n rows — the distribution that breaks any
    * "carry the previous band's tail" shortcut.
    */
  private lazy val spiky: DataFrame = {
    spark.range(3000).selectExpr(
      "id AS event_id",
      // key 0: dense; key 1: bursty with day-scale gaps; key 2: very sparse
      "concat('k', cast(id % 3 AS string)) AS event_type",
      """timestamp_micros(CASE
         |  WHEN id % 3 = 0 THEN 1700000000000000 + (id div 3) * 900000000
         |  WHEN id % 3 = 1 THEN 1700000000000000 +
         |    ((id div 300) * 5 * 86400000000) + (id % 300) * 7000000
         |  ELSE 1700000000000000 + (id div 3) * 40000000000
         |END)""".stripMargin + " AS ts",
      "cast(pmod(id * 37 + 11, 101) AS DOUBLE) / 7 AS value")
      .repartition(7) // scramble physical order: banding must not depend on it
  }

  private def flatTrailing(df: DataFrame, n: Int): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy("ts", "event_id")
      .rowsBetween(-n, -1)
    df.withColumn("roll_n", count("value").over(w))
      .withColumn("roll_avg", round(avg("value").over(w), 6))
      .withColumn("roll_med", round(expr("percentile(value, 0.5)").over(w), 6))
  }

  private def bandedTrailing(df: DataFrame, n: Int, bucketSeconds: Long): DataFrame =
    BandedWindow.trailingRows(df, "event_type", "ts", "event_id", n,
      Seq(
        "roll_n" -> (w => count("value").over(w)),
        "roll_avg" -> (w => round(avg("value").over(w), 6)),
        "roll_med" -> (w => round(expr("percentile(value, 0.5)").over(w), 6))),
      bucketSeconds)

  private def sorted(df: DataFrame): Seq[org.apache.spark.sql.Row] =
    df.orderBy("event_type", "event_id").collect().toSeq

  test("banded trailing frame equals the flat window on the spiky stream (day bands)") {
    assert(sorted(bandedTrailing(spiky, 20, 86400L)) == sorted(flatTrailing(spiky, 20)))
  }

  test("parity holds with bands far narrower than the frame (every band sparse)") {
    // 1-hour bands: most bands hold fewer than n rows, so nearly every frame
    // crosses several band edges and many hop empty bands entirely
    assert(sorted(bandedTrailing(spiky, 20, 3600L)) == sorted(flatTrailing(spiky, 20)))
    // and a frame deeper than any band's row count
    assert(sorted(bandedTrailing(spiky, 50, 3600L)) == sorted(flatTrailing(spiky, 50)))
  }

  test("banded lead equals the flat lead, including across empty bands") {
    val flat = spiky.withColumn("nxt",
      lead("value", 1).over(Window.partitionBy("event_type").orderBy("ts", "event_id")))
    for (width <- Seq(86400L, 3600L)) {
      val banded = BandedWindow.leadValue(spiky, "event_type", "ts", "event_id",
        "value", "nxt", width)
      assert(sorted(banded) == sorted(flat), s"lead mismatch at band width $width")
    }
  }

  test("the banded plan partitions window work by (key, band), not key alone") {
    val plan = bandedTrailing(spiky, 20, 86400L).queryExecution.executedPlan.toString
    assert(plan.contains("hashpartitioning(event_type"),
      s"expected a (key, band) exchange in:\n$plan")
    assert(raw"hashpartitioning\(event_type#\d+, _bkt#\d+".r.findFirstIn(plan).isDefined,
      s"window exchange must cluster by (event_type, _bkt):\n$plan")
    // the stream genuinely spreads across many bands — this is the
    // parallelism the flat window's 3 tasks could never use
    val bands = spiky.select(col("event_type"),
      expr("unix_micros(ts) div 86400000000")).distinct().count()
    assert(bands > 30, s"fixture should span many (key, band) cells, got $bands")
  }

  test("ordinal equals the flat per-key row_number over a VALUE order") {
    // rank by value (not time) — the Gini/selection use; bands from the
    // value itself, including a width so narrow most bands are sparse
    val flat = spiky.withColumn("i", row_number().over(
      Window.partitionBy("event_type").orderBy("value", "event_id")))
    for (width <- Seq(1.0, 0.01)) {
      val banded = BandedWindow.ordinal(spiky, "event_type", "value",
        "event_id", expr(s"CAST(value / $width AS BIGINT)"), "i")
      assert(sorted(banded) == sorted(flat), s"ordinal mismatch at width $width")
    }
  }

  test("ordinal partitions its rank work by (key, band), not key alone") {
    val plan = BandedWindow.ordinal(spiky, "event_type", "value", "event_id",
      expr("CAST(value AS BIGINT)"), "i").queryExecution.executedPlan.toString
    assert(raw"hashpartitioning\(event_type#\d+, _bkt#\d+".r.findFirstIn(plan).isDefined,
      s"rank exchange must cluster by (event_type, _bkt):\n$plan")
  }

  /** Every message in the failure's cause chain, concatenated — Spark wraps
    * a task-side raise_error in SparkException layers.
    */
  private def chain(t: Throwable): String =
    Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10)
      .map(x => Option(x.getMessage).getOrElse("")).mkString(" | ")

  test("a null timestamp fails loudly instead of silently stranding the row") {
    // r10 verdict "what's wrong" #3: a null ts row has no band; the flat
    // window would order it first, the banded one would drop it from every
    // frame — a silent divergence. The guard must throw, naming the hazard.
    val withNull = spiky.withColumn("ts",
      when(col("event_id") === 7, lit(null).cast("timestamp")).otherwise(col("ts")))
    val e = intercept[Throwable] {
      bandedTrailing(withNull, 20, 86400L).collect()
    }
    assert(chain(e).contains("null"), chain(e))
    val e2 = intercept[Throwable] {
      BandedWindow.leadValue(withNull, "event_type", "ts", "event_id",
        "value", "nxt").collect()
    }
    assert(chain(e2).contains("null"), chain(e2))
  }

  test("ordinal rejects a null band and a non-monotone band, loudly") {
    val nullBand = intercept[Throwable] {
      BandedWindow.ordinal(spiky, "event_type", "value", "event_id",
        expr("CAST(NULL AS BIGINT)"), "i").collect()
    }
    assert(chain(nullBand).contains("null"), chain(nullBand))
    // a band keyed off event_id is unrelated to the value order: adjacent
    // bands overlap in value, which would silently corrupt every global
    // rank — the guard's tiny-table min/max check must refuse
    val nonMono = intercept[Throwable] {
      BandedWindow.ordinal(spiky, "event_type", "value", "event_id",
        expr("event_id % 2"), "i").collect()
    }
    assert(chain(nonMono).contains("monotone"), chain(nonMono))
  }
}
