package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TemporalJoinSpec extends SparkSpec {
  import spark.implicits._

  test("asofBackward matches a brute-force per-row argmax, including at-or-before ties") {
    // left at ts 5/10/20; right at 5 (exact tie), 9, 15; key 2 has no right rows
    val left = Seq((1L, "k1", 5L, "a"), (2L, "k1", 10L, "b"), (3L, "k1", 20L, "c"),
      (4L, "k2", 10L, "d")).toDF("id", "k", "ts", "lpay")
    val right = Seq(("k1", 5L, "r5"), ("k1", 9L, "r9"), ("k1", 15L, "r15"))
      .toDF("k", "ts", "rpay")
    val got = TemporalJoin.asofBackward(left, right, Seq("k"), "ts", Seq("rpay"))
      .select("id", "asof_ts", "rpay").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1),
        Option(r.getString(2)).getOrElse("-"))).toSet
    // ts=5 matches the SAME-instant right row (at-or-before), ts=10 the 9,
    // ts=20 the 15, and the keyless-right left row stays with NULLs
    assert(got === Set((1L, 5L, "r5"), (2L, 9L, "r9"), (3L, 15L, "r15"), (4L, -1L, "-")))
  }

  test("asofNearest: forward-nearer, backward-nearer, equal-distance tie, exact instant, no match") {
    // left 10: right at 9 (d1 back) vs 12 (d2 fwd) -> backward r9
    // left 20: right at 12 (d8 back) vs 21 (d1 fwd) -> forward r21
    // left 30: right at 27 and 33 (d3 both) -> tie prefers backward r27
    // left 40: right at exactly 40 -> distance-0 backward match
    // key 2: no right rows -> NULLs
    val left = Seq((1L, "k1", 10L, "a"), (2L, "k1", 20L, "b"),
      (3L, "k1", 30L, "c"), (4L, "k1", 40L, "d"), (5L, "k2", 10L, "e"))
      .toDF("id", "k", "ts", "lpay")
    val right = Seq(("k1", 9L, "r9"), ("k1", 12L, "r12"), ("k1", 21L, "r21"),
      ("k1", 27L, "r27"), ("k1", 33L, "r33"), ("k1", 40L, "r40"))
      .toDF("k", "ts", "rpay")
    val got = TemporalJoin.asofNearest(left, right, Seq("k"), "ts", Seq("rpay"))
      .select("id", "asof_ts", "rpay").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1),
        Option(r.getString(2)).getOrElse("-"))).toSet
    assert(got === Set((1L, 9L, "r9"), (2L, 21L, "r21"), (3L, 27L, "r27"),
      (4L, 40L, "r40"), (5L, -1L, "-")))
  }

  test("asofBackward: a legitimately-NULL payload field on the matched row survives (struct carrier)") {
    val left = Seq((1L, "k", 10L)).toDF("id", "k", "ts")
    val right = Seq(("k", 3L, Some("early")), ("k", 8L, None))
      .toDF("k", "ts", "rpay")
    val row = TemporalJoin.asofBackward(left, right, Seq("k"), "ts", Seq("rpay")).head()
    // the ts=8 row (rpay NULL) is the match; ignoreNulls must NOT fall back
    // to the earlier non-null payload
    assert(row.getAs[Long]("asof_ts") === 8L)
    assert(row.isNullAt(row.fieldIndex("rpay")))
  }

  test("asofBackward rejects colliding payload names") {
    val df = Seq((1L, "k", 1L)).toDF("ts", "k", "pay")
    val e = intercept[IllegalArgumentException] {
      TemporalJoin.asofBackward(df, df, Seq("k"), "ts", Seq("pay"))
    }
    assert(e.getMessage.contains("collide"))
  }

  test("rangeJoinBucketed equals the brute-force inequality join on real events, edges exact") {
    val ev = graft.Tables.events(spark, sf0001).withColumn("us", unix_micros(col("ts")))
    val l = ev.filter(col("event_type") === "error").select(col("event_id"), col("user_id"), col("us"))
    val r = ev.filter(col("event_type") === "view").select(col("user_id"), col("us").as("rus"))
    val w = 600L * 1000000L
    val got = TemporalJoin.rangeJoinBucketed(l, r, Seq("user_id"), "us", "rus", 0L, w)
      .select("event_id", "rus").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    val brute = l.collect().flatMap { lr =>
      val (id, u, us) = (lr.getLong(0), lr.getLong(1), lr.getLong(2))
      r.collect().collect { case rr if rr.getLong(0) == u &&
        rr.getLong(1) > us && rr.getLong(1) <= us + w => (id, rr.getLong(1)) }
    }.toSet
    assert(got === brute)
    assert(got.nonEmpty, "fixture must actually produce pairs")
  }

  test("rangeJoinBucketed half-open edges: low edge excluded, high edge included, bucket boundary crossed") {
    // window (0, 10]: right at l+0 excluded, l+10 included, l+11 excluded;
    // ts 95 -> 105 crosses the width-10 bucket boundary at 100
    val l = Seq((1L, "k", 95L)).toDF("id", "k", "us")
    val r = Seq(("k", 95L), ("k", 105L), ("k", 106L), ("k", 104L))
      .toDF("k", "rus")
    val got = TemporalJoin.rangeJoinBucketed(l, r, Seq("k"), "us", "rus", 0L, 10L)
      .select("rus").collect().map(_.getLong(0)).toSet
    assert(got === Set(104L, 105L))
  }

  test("intervalOverlapBucketed equals the brute-force overlap join on real events, pairs emitted once") {
    val ev = graft.Tables.events(spark, sf0001).withColumn("us", unix_micros(col("ts")))
    val l = ev.filter(col("event_type") === "view")
      .select(col("event_id"), col("user_id"), col("us").as("ls"),
        (col("us") + floor(col("value")) * 10000000L).as("le"))
    val r = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("us").as("rs"),
        (col("us") + floor(col("value")) * 1000000L).as("re"))
    val gotAll = TemporalJoin.intervalOverlapBucketed(l, r, Seq("user_id"),
      "ls", "le", "rs", "re", 600L * 1000000L)
      .select("event_id", "rs").collect().map(x => (x.getLong(0), x.getLong(1)))
    assert(gotAll.length === gotAll.distinct.length, "a pair crossed buckets and was emitted twice")
    val brute = l.collect().flatMap { lr =>
      val (id, u, ls, le) = (lr.getLong(0), lr.getLong(1), lr.getLong(2), lr.getLong(3))
      r.collect().collect { case rr if rr.getLong(0) == u &&
        math.max(ls, rr.getLong(1)) < math.min(le, rr.getLong(2)) => (id, rr.getLong(1)) }
    }.toSet
    assert(gotAll.toSet === brute)
    assert(brute.nonEmpty, "fixture must actually produce overlaps")
  }

  test("intervalOverlapBucketed: multi-bucket span emits once; empty intervals never match") {
    // left [95, 125) spans buckets 9..12 at width 10; right [105, 118) spans 10..11
    val l = Seq((1L, "k", 95L, 125L)).toDF("id", "k", "ls", "le")
    val r = Seq(("k", 105L, 118L), // overlaps, claimed by bucket of max(95,105)=105
      ("k", 100L, 100L), // EMPTY right interval strictly inside left: no match
      ("k", 125L, 130L), // touches at the half-open edge: no match
      ("k", 90L, 96L) // overlaps on the entry edge
    ).toDF("k", "rs", "re")
    val got = TemporalJoin.intervalOverlapBucketed(l, r, Seq("k"), "ls", "le", "rs", "re", 10L)
      .select("rs").collect().map(_.getLong(0)).toSeq.sorted
    assert(got === Seq(90L, 105L))
    // empty LEFT interval matches nothing either
    val le = Seq((1L, "k", 100L, 100L)).toDF("id", "k", "ls", "le")
    assert(TemporalJoin.intervalOverlapBucketed(le, r, Seq("k"), "ls", "le", "rs", "re", 10L).count() === 0L)
  }

  test("plans: asof joins without a join operator; range join is a hash join, never nested-loop") {
    val asofPlan = graft.queries.CoreQueries.q59(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(!asofPlan.contains("CartesianProduct") &&
      !asofPlan.contains("BroadcastNestedLoopJoin"), asofPlan)
    // the union-then-window form has a Window but NO binary join operator
    assert(asofPlan.contains("Window"), asofPlan)
    assert(!asofPlan.contains("SortMergeJoin") && !asofPlan.contains("HashJoin"), asofPlan)

    val rangePlan = graft.queries.CoreQueries.q60(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(!rangePlan.contains("CartesianProduct") &&
      !rangePlan.contains("BroadcastNestedLoopJoin"), rangePlan)
    assert(rangePlan.contains("HashJoin") || rangePlan.contains("SortMergeJoin"), rangePlan)

    val overlapPlan = graft.queries.CoreQueries.q61(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(!overlapPlan.contains("CartesianProduct") &&
      !overlapPlan.contains("BroadcastNestedLoopJoin"), overlapPlan)
    assert(overlapPlan.contains("HashJoin") || overlapPlan.contains("SortMergeJoin"), overlapPlan)
  }
}
