package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(Long, String, String)], maxDist: Int = 3, cap: Int = 10) =
    FuzzyJoin.bestMatch(
      rows.toDF("id", "name", "blk"), "id", Seq("blk"), "name",
      (a, b) => levenshtein(a, b), maxDist, cap)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq.sortBy(_._1)

  test("matches only within a block, best candidate wins, ties break by id") {
    val out = run(Seq(
      (1L, "cold widget", "w"), (2L, "bold widget", "w"), (3L, "cold gadget", "w"),
      (4L, "cold widget", "z"))) // same name, different block -> invisible
    // 1's candidates: 2 at dist 1, 3 at dist 2 -> 2
    assert(out.contains((1L, 2L, 1)))
    assert(out.contains((2L, 1L, 1)))
    // 3's best is 1 ("cold gadget" vs "cold widget": 2 substitutions)
    assert(out.contains((3L, 1L, 2)))
    assert(!out.exists(_._1 == 4L)) // alone in its block
  }

  test("equidistant candidates resolve to the smaller id") {
    val out = run(Seq(
      (5L, "aaaa", "b"), (9L, "aaab", "b"), (7L, "aaac", "b")))
    assert(out.find(_._1 == 5L).get._2 == 7L) // dist 1 to both 7 and 9
  }

  test("saturated blocks are dropped, not exploded") {
    val big = (1L to 6L).map(i => (i, s"name$i", "hot"))
    val small = Seq((100L, "abc", "ok"), (101L, "abd", "ok"))
    val out = run(big ++ small, maxDist = 10, cap = 5)
    assert(out.map(_._1).toSet == Set(100L, 101L)) // hot block (6 > cap) gone
  }

  test("cap guard rejects pairless settings") {
    intercept[IllegalArgumentException] {
      run(Seq((1L, "a", "b")), cap = 1)
    }
  }

  test("reserved internal column names are rejected, not shadowed") {
    val clashing = Seq((1L, "a", "b", 9)).toDF("id", "name", "blk", "_d")
    val e = intercept[IllegalArgumentException] {
      FuzzyJoin.bestMatch(clashing, "id", Seq("blk"), "name",
        (a, b) => levenshtein(a, b), 3, 10)
    }
    assert(e.getMessage.contains("_d"))
  }
}
