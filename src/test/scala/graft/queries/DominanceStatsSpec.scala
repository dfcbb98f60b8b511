package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Brute-force differentials for the r10 dominance/concentration trio:
  * q98's banded prefix-max skyline vs the textbook all-pairs dominance
  * check, q99's banded-rank Gini vs the sequential definition, and
  * q100's digit law vs direct recomputation — the constructions whose
  * oracle agreement alone could in principle be a fixture coincidence.
  */
class DominanceStatsSpec extends SparkSpec {

  test("q102 CUSUM changepoint == the textbook argmax on the real events") {
    // brute-force per type: daily counts in day order, dev_i = n·P_i − i·T,
    // peak |dev| with the earlier day winning ties
    val daily = Tables.events(spark, sf0001)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("x"))
      .collect().map(r => (r.getString(0), r.getDate(1), r.getLong(2)))
    val want = daily.groupBy(_._1).map { case (t, rows) =>
      val xs = rows.sortBy(_._2.toString).map(r => (r._2, r._3))
      val n = xs.length.toLong
      val total = xs.map(_._2).sum
      var p = 0L
      val devs = xs.zipWithIndex.map { case ((d, x), i0) =>
        p += x; (d, math.abs(n * p - (i0 + 1).toLong * total))
      }
      val (cpDay, peak) = devs.maxBy { case (d, a) => (a, -d.getTime) }
      (t, n, cpDay, peak,
        BigDecimal(peak.toDouble / (n.toDouble * total.toDouble))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toSeq.sortBy(_._1)
    val got = CoreQueries.q102(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDate(2), r.getLong(3),
        r.getDouble(4))).toSeq
    assert(got == want)
  }

  test("q103 Theil-Sen == the brute-force pairwise-slope median per nation") {
    val monthly = Tables.orders(spark, sf0001)
      .join(Tables.customer(spark, sf0001), col("o_custkey") === col("c_custkey"))
      .join(Tables.nation(spark, sf0001), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"),
        ((year(col("o_orderdate")) - 1995) * 12 + month(col("o_orderdate")) - 1).as("x"))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("y"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getDecimal(2)))
    val want = monthly.groupBy(_._1).map { case (nation, pts) =>
      val slopes = (for {
        a <- pts; b <- pts if a._2 < b._2
      } yield (b._3.subtract(a._3)).doubleValue() / (b._2 - a._2)).sorted
      val m = slopes.length
      val med = if (m % 2 == 1) slopes(m / 2)
        else (slopes(m / 2 - 1) + (slopes(m / 2) - slopes(m / 2 - 1)) * 0.5)
      (nation, pts.length.toLong, m.toLong,
        BigDecimal(med).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toSeq.sortBy(_._1)
    val got = CoreQueries.q103(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got == want)
  }

  test("q98 skyline == all-pairs dominance on the real part table") {
    val pts = Tables.part(spark, sf0001)
      .select(col("p_partkey"), col("p_retailprice"), col("p_size"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
    // textbook: keep p iff NO q has (price ≤, size ≥) with one strict
    val want = pts.filter { case (_, x, y) =>
      !pts.exists { case (_, x2, y2) =>
        x2 <= x && y2 >= y && (x2 < x || y2 > y) }
    }.map(t => (t._1, BigDecimal(t._2).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble, t._3))
      .sortBy(t => (t._2, t._1)).take(500).toSeq
    val got = CoreQueries.q98(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2))).toSeq
    assert(got == want)
  }

  test("q99 gini == the sequential rank definition per nation") {
    val byNation = Tables.orders(spark, sf0001)
      .groupBy("o_custkey")
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("v"))
      .join(Tables.customer(spark, sf0001)
        .select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .select("c_nationkey", "o_custkey", "v")
      .collect()
      .map(r => (r.getAs[Number](0).longValue, r.getLong(1), r.getDecimal(2)))
      .groupBy(_._1)
    val wantGini = byNation.map { case (nat, rows) =>
      val vs = rows.sortBy(t => (t._3, t._2)).map(t => BigDecimal(t._3))
      val n = vs.size
      val s = vs.sum
      val s1 = vs.zipWithIndex.map { case (v, i) => v * (i + 1) }.sum
      nat -> BigDecimal(
        (2.0 * s1.toDouble - (n + 1).toDouble * s.toDouble) /
          (n.toDouble * s.toDouble))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val nations = Tables.nation(spark, sf0001)
      .select("n_nationkey", "n_name").collect()
      .map(r => r.getAs[Number](0).longValue -> r.getString(1)).toMap
    val got = CoreQueries.q99(spark, sf0001).collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    wantGini.foreach { case (nat, g) =>
      assert(got(nations(nat)) == g, s"nation ${nations(nat)}")
    }
    assert(got.size == wantGini.size)
  }

  test("q100 digit counts and chi-square match direct recomputation") {
    val prices = Tables.orders(spark, sf0001)
      .select("o_totalprice").collect().map(_.getDouble(0))
    val counts = prices.groupBy(p => p.toLong.toString.head.asDigit)
      .view.mapValues(_.length.toLong).toMap
    val total = prices.length.toLong
    val rows = CoreQueries.q100(spark, sf0001).collect()
    assert(rows.map(_.getInt(0)).toSeq == counts.keys.toSeq.sorted)
    rows.foreach { r =>
      val d = r.getInt(0)
      assert(r.getLong(1) == counts(d), s"digit $d count")
      val p = CoreQueries.benfordP(d - 1)
      val dev = counts(d) - total * p
      val contrib = dev * dev / (total * p)
      assert(r.getDouble(4) ==
        BigDecimal(contrib).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
        s"digit $d contrib")
    }
    // chi2 column is constant and equals the sum of scale-9-rounded parts
    val chi2 = rows.map(_.getDouble(5)).distinct
    assert(chi2.size == 1)
  }

  test("q99's rank work is banded — the plan clusters by (nation, band)") {
    val plan = CoreQueries.q99(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(raw"hashpartitioning\(c_nationkey#\d+, _bkt#\d+".r
      .findFirstIn(plan).isDefined,
      s"gini rank must not serialize on 25 nations:\n$plan")
  }

  test("q98's prefix max is banded — per-band window plus a band-table carry") {
    val plan = CoreQueries.q98(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(raw"hashpartitioning\(band#\d+".r.findFirstIn(plan).isDefined,
      s"skyline prefix max must partition by band:\n$plan")
  }
}
