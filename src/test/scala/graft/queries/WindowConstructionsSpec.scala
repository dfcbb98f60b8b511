package graft.queries

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Randomized differentials for the three window CONSTRUCTIONS round 8
  * introduced — each has a non-obvious closed form whose oracle agreement
  * on the fixed corpus could in principle be coincidental, so these pit
  * the Spark construction against a brute-force sequential reference on
  * seeded random inputs (the shapes the corpus doesn't exercise: empty
  * prefixes, ties, saturated clamps, gap edges).
  */
class WindowConstructionsSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new Random(20260814L)

  test("clamped balance closed form == the sequential max(0, b+x) recurrence") {
    // q87's identity: balance_i = prefix_i - min(0, running_min(prefix))
    (1 to 20).foreach { _ =>
      val xs = Seq.fill(1 + rnd.nextInt(40))(rnd.nextInt(41) - 20)
      val seq = xs.scanLeft(0L)((b, x) => math.max(0L, b + x)).tail
      val df = xs.zipWithIndex.map { case (x, i) => (i, x) }.toDF("i", "x")
      val w = org.apache.spark.sql.expressions.Window.orderBy("i")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      val got = df
        .withColumn("pfx", sum("x").over(w))
        .withColumn("rmin", min("pfx").over(w))
        .select(col("i"), (col("pfx") - least(lit(0L), col("rmin"))).as("b"))
        .orderBy("i").as[(Int, Long)].collect().map(_._2).toSeq
      assert(got == seq, s"xs=$xs")
    }
  }

  test("cascaded running maxes find exactly the chains a brute-force search finds") {
    // q81's claim: a view->click->purchase chain with (purchase - view) <= W
    // exists iff ca(purchase) >= purchase - W, where ca is the running max
    // over clicks of each click's last-preceding view.
    val W = 10L
    (1 to 30).foreach { _ =>
      val types = Seq("view", "click", "purchase", "other")
      val evs = Seq.fill(2 + rnd.nextInt(14))(
        (rnd.nextInt(100).toLong, types(rnd.nextInt(types.size))))
        .zipWithIndex.map { case ((t, ty), id) => (t, id.toLong, ty) }
      // brute force: any strictly (ts,id)-ordered v < c < p with p.ts - v.ts <= W
      def lt(a: (Long, Long, String), b: (Long, Long, String)) =
        a._1 < b._1 || (a._1 == b._1 && a._2 < b._2)
      val expect = evs.exists { p => p._3 == "purchase" && evs.exists { c =>
        c._3 == "click" && lt(c, p) && evs.exists { v =>
          v._3 == "view" && lt(v, c) && p._1 - v._1 <= W } } }
      val wPrev = org.apache.spark.sql.expressions.Window.orderBy("us", "id")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      val got = evs.toDF("us", "id", "t")
        .withColumn("lv", max(when(col("t") === "view", col("us"))).over(wPrev))
        .withColumn("ca", max(when(col("t") === "click", col("lv"))).over(wPrev))
        .filter(col("t") === "purchase" && col("ca") >= col("us") - W)
        .count() > 0
      assert(got == expect, s"evs=$evs")
    }
  }

  test("WAU coverage intervals count each user once per covered day, and only those") {
    // q73's claim: exploding [max(d, prev+7), d+6] per active day yields
    // exactly one row per (user, day-with-activity-in-trailing-7)
    (1 to 30).foreach { _ =>
      val days = Seq.fill(1 + rnd.nextInt(12))(rnd.nextInt(40)).distinct.sorted
      val expect = (days.min to days.max + 6)
        .filter(e => days.exists(d => d <= e && d >= e - 6)).map(_.toLong)
      val w = org.apache.spark.sql.expressions.Window.orderBy("d")
      val got = days.map(_.toLong).toDF("d")
        .withColumn("prev", lag("d", 1).over(w))
        .withColumn("from",
          when(col("prev").isNull, col("d"))
            .otherwise(greatest(col("d"), col("prev") + 7)))
        .select(explode(sequence(col("from"), col("d") + 6)).as("e"))
        .as[Long].collect().toSeq.sorted
      assert(got == expect, s"days=$days") // sorted equality => no day double-counted
    }
  }
}
