package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class GraphSpec extends SparkSpec {
  import spark.implicits._

  private def ranks(pairs: Seq[(Long, Long)], iters: Int = 5): Map[Long, Long] = {
    val (r, _) = Graph.pagerank(pairs.toDF("src", "dst"), iters)
    r.collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
  }

  test("star graph: the hub outranks every leaf") {
    val r = ranks(Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L)))
    assert((1L to 4L).forall(l => r(0L) > r(l)))
    assert((1L to 4L).map(r).distinct.size == 1) // leaves are symmetric
  }

  test("path graph: the middle node ranks highest, ends lowest") {
    val r = ranks(Seq((1L, 2L), (2L, 3L)))
    assert(r(2L) > r(1L) && r(2L) > r(3L))
    assert(r(1L) == r(3L)) // symmetric ends bit-identical
  }

  test("mass is conserved up to the documented integer-division shed") {
    val pairs = Seq((0L, 1L), (0L, 2L), (1L, 2L), (2L, 3L), (3L, 4L))
    val (r, n) = Graph.pagerank(pairs.toDF("src", "dst"), iters = 5)
    val total = r.agg(sum("u")).first().getLong(0)
    assert(n == 5)
    assert(total <= Graph.massUnits)
    // per round each node sheds < deg units to floor division and the
    // damping mix sheds < 1 unit per node: micro-loss, never gain
    assert(total > GraphSpecBounds.massUnitsLowerBound(nNodes = 5, iters = 5))
  }

  test("regular graph is the fixpoint: uniform ranks stay uniform") {
    // a 4-cycle: every node degree 2 — rank must stay exactly 1/n
    val r = ranks(Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L)))
    assert(r.values.toSet.size == 1)
  }

  private def pprRanks(pairs: Seq[(Long, Long)], seeds: Seq[Long],
      iters: Int = 4): Map[Long, Long] =
    Graph.personalizedPagerank(pairs.toDF("src", "dst"), seeds.toDF("node"),
      seeds.size.toLong, iters)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap

  test("ppr: mass concentrates on the seed and decays with hop distance") {
    // path 0-1-2-3-4, seeded at 0. A path is bipartite, so early rounds
    // oscillate between the seed's parity classes; by round 20 the damping
    // has contracted the oscillation and the fixpoint shows. At the
    // fixpoint the degree-1 seed donates ALL its mass each round and keeps
    // only the restart, so its neighbor narrowly outranks it (π1 ≈ 1.14·π0)
    // — the honest assertions are monotone decay PAST the first hop, and
    // the seed dominating everything two or more hops out.
    val r = pprRanks(Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L)), Seq(0L),
      iters = 20)
    assert(r(1L) > r(2L) && r(2L) > r(3L) && r(3L) > r(4L))
    assert(r(0L) > r(2L))
  }

  test("ppr: an unreached component holds no mass at any parity") {
    // two components 0-1 and 10-11, seeded only at 0: the other component
    // must stay absent whether the round count is odd or even
    Seq(3, 4).foreach { it =>
      val r = pprRanks(Seq((0L, 1L), (10L, 11L)), Seq(0L), iters = it)
      assert(!r.contains(10L) && !r.contains(11L))
    }
    // at even parity (mass back home) the seed outranks its neighbor
    val r = pprRanks(Seq((0L, 1L), (10L, 11L)), Seq(0L), iters = 4)
    assert(r(0L) > r(1L))
  }

  test("ppr: symmetric seeds on a symmetric graph rank bit-identically") {
    val r = pprRanks(Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L)), Seq(0L, 2L))
    assert(r(0L) == r(2L) && r(1L) == r(3L))
    assert(r(0L) > r(1L))
  }

  test("ppr: total mass never exceeds the restart+walk budget") {
    val r = pprRanks(Seq((0L, 1L), (0L, 2L), (1L, 2L)), Seq(0L), iters = 5)
    assert(r.values.sum <= Graph.massUnits)
  }

  test("degree profile counts nodes per degree") {
    val p = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("src", "dst")
    val d = Graph.degreeProfile(p).collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(d == Map(1L -> 3L, 3L -> 1L))
  }

  test("iteration bounds are enforced") {
    intercept[IllegalArgumentException] {
      Graph.pagerank(Seq((0L, 1L)).toDF("src", "dst"), iters = 0)
    }
  }

  test("empty edge list is rejected loudly, not returned as empty ranks") {
    intercept[IllegalArgumentException] {
      Graph.pagerank(Seq.empty[(Long, Long)].toDF("src", "dst"), iters = 1)
    }
  }

  test("triangleStats: K4 has 4 triangles; the census is direction/dup-proof") {
    // K4 = 6 edges, C(4,3)=4 triangles, wedges = 4 * C(3,2) = 12, gcc = 1.
    // Feed edges with mixed direction and a duplicate to prove normalization.
    val e = (Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
      ++ Seq((3L, 1L), (4L, 2L))).toDF("a", "b")
    val r = Graph.triangleStats(e).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))
      == ((4L, 6L, 12L, 4L, 1.0)))
  }

  test("triangleStats: a triangle-free star reports zero closures") {
    val e = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("a", "b")
    val r = Graph.triangleStats(e).collect().head
    assert(r.getLong(3) == 0L && r.getLong(2) == 3L) // wedges C(3,2) at the hub
  }

  test("triangleStats: ids past 31 bits count identically (no key-width hazard)") {
    // the adjacency-intersection closure keys on raw node ids — K3 shifted
    // into 33-bit id space still counts exactly one triangle
    val base = 1L << 32
    val e = Seq((base, base + 1), (base, base + 2), (base + 1, base + 2))
      .toDF("a", "b")
    val r = Graph.triangleStats(e).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(3), r.getDouble(4))
      == ((3L, 3L, 1L, 1.0)))
  }

  test("triangleStats: INT-typed ids and an empty frame are safe (r9 ADVICE class)") {
    // int32 ids were the latent hazard of the retired packed-key closure
    // (Java int shift no-op); the adjacency closure must count them exactly
    val ints = Seq((1, 2), (1, 3), (2, 3)).toDF("a", "b")
    assert(Graph.triangleStats(ints).collect().head.getLong(3) == 1L)
    // an empty edge frame reports a zero census instead of throwing
    val empty = Seq.empty[(Long, Long)].toDF("a", "b")
    val r = Graph.triangleStats(empty).collect().head
    assert(r.getLong(0) == 0L && r.getLong(3) == 0L)
  }

  test("kcorePeel: a K4 core survives while its pendant peels in round 1") {
    // K4 on 1–4 plus pendant 5 hanging off 4; k=2. Round 1 drops node 5
    // (degree 1) and its edge; the K4 (all degrees ≥ 3) is the fixpoint,
    // so rounds 2–3 must repeat the round-1 row exactly (idempotence).
    val e = (Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
      :+ ((4L, 5L))).toDF("a", "b")
    val t = Graph.kcorePeel(e, k = 2L, rounds = 3).orderBy("round").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(t.toSeq == Seq((1, 2L, 4L, 6L), (2, 2L, 4L, 6L), (3, 2L, 4L, 6L)))
  }

  test("kcorePeel: a path cascades to empty, and stays empty") {
    // 1-2-3-4 at k=2: round 1 keeps the interior {2,3} (1 edge); round 2
    // finds both below k and empties the graph; round 3 reports the empty
    // fixpoint rather than throwing.
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("a", "b")
    val t = Graph.kcorePeel(e, k = 2L, rounds = 3).orderBy("round").collect()
      .map(r => (r.getInt(0), r.getLong(2), r.getLong(3)))
    assert(t.toSeq == Seq((1, 2L, 1L), (2, 0L, 0L), (3, 0L, 0L)))
  }

  test("kcorePeel: mixed-direction duplicates normalize before peeling") {
    // the same triangle fed as (a,b), (b,a) and a duplicate must peel as
    // 3 nodes / 3 edges at k=2 — normalization is the operator's job
    val e = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L), (1L, 3L)).toDF("a", "b")
    val t = Graph.kcorePeel(e, k = 2L, rounds = 2).orderBy("round").collect()
      .map(r => (r.getLong(2), r.getLong(3)))
    assert(t.toSeq == Seq((3L, 3L), (3L, 3L)))
  }

  test("coreThreshold: the exact median degree, floored, at least 2") {
    // K4 + pendant: degrees 3,3,3,4,1 → median 3 → k = 3
    val sparse = (Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
      :+ ((4L, 5L))).toDF("a", "b")
    assert(Graph.coreThreshold(sparse) == 3L)
    // K9: every degree 8 → k = 8 (the threshold tracks density)
    val nine = (1L to 9L).flatMap(i => ((i + 1) to 9L).map(j => (i, j))).toDF("a", "b")
    assert(Graph.coreThreshold(nine) == 8L)
    // even count with an interpolated midpoint: degrees 1,1,2,2 over a path
    // 1-2-3-4 → median 1.5 → floor 1 → clamped to the floor of 2
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("a", "b")
    assert(Graph.coreThreshold(path) == 2L)
  }

  test("labelPropagation: bridged triangles settle into their two communities") {
    // K3 {1,2,3} — bridge (3,4) — K3 {4,5,6}. Hand-traced sync LPA with the
    // (count desc, label asc) tie rule converges by round 4 to labels
    // {1,1,1} and {3,3,3}: two communities of size 3.
    val e = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (4L, 5L), (4L, 6L), (5L, 6L))
      .toDF("a", "b")
    val lbl = Graph.labelPropagation(e, rounds = 5).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lbl == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 3L, 5L -> 3L, 6L -> 3L))
  }

  test("bfsLevels: min-hop levels on a path with a shortcut, frontier exhaustion is free") {
    // path 1-2-3-4-5 plus shortcut (1,4): levels from {1} are
    // 1→0, 2→1, 4→1, 3→2, 5→2 (node 3 via 2 OR 4 — both level-1 parents,
    // still min-hop 2; node 4 must NOT be 3 despite the path route)
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (1L, 4L)).toDF("src", "dst")
    val lv = Graph.bfsLevels(e, Seq(1L).toDF("node"), rounds = 6).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lv == Map(1L -> 0L, 2L -> 1L, 4L -> 1L, 3L -> 2L, 5L -> 2L))
    // unreachable component stays out; budget smaller than the diameter truncates
    val e2 = e.union(Seq((10L, 11L)).toDF("src", "dst"))
    val lv2 = Graph.bfsLevels(e2, Seq(1L).toDF("node"), rounds = 1).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lv2 == Map(1L -> 0L, 2L -> 1L, 4L -> 1L))
  }

  test("labelPropagation: a clique reaches full consensus on its min id") {
    val e = (1L to 4L).flatMap(i => ((i + 1) to 4L).map(j => (i, j))).toDF("a", "b")
    val lbl = Graph.labelPropagation(e, rounds = 4).collect().map(_.getLong(1))
    assert(lbl.toSet == Set(1L))
  }

  test("kcorePeel: bounds are enforced loudly") {
    val e = Seq((1L, 2L)).toDF("a", "b")
    intercept[IllegalArgumentException] { Graph.kcorePeel(e, k = 0L, rounds = 1) }
    intercept[IllegalArgumentException] { Graph.kcorePeel(e, k = 2L, rounds = 0) }
    intercept[IllegalArgumentException] { Graph.kcorePeel(e, k = 2L, rounds = 21) }
  }

  test("commonNeighbors: oversized groups drop; remaining pairs score exactly") {
    // group "hot" (3 items, cap 2) must vanish; group "ok" pairs normally
    val e = Seq((1L, 10L), (1L, 11L), (1L, 12L), (2L, 20L), (2L, 21L), (3L, 20L))
      .toDF("g", "i")
    val out = Graph.commonNeighbors(e, cap = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // only (20,21) from group 2 survives; deg(20)=2 (groups 2 and 3), deg(21)=1
    assert(out.toSeq == Seq((20L, 21L, 1L, 1.0)))
  }
}

/** Spec-local helper: loose lower bound for the conserved-mass check. */
object GraphSpecBounds {
  def massUnitsLowerBound(nNodes: Int, iters: Int): Long =
    Graph.massUnits - iters.toLong * nNodes * (nNodes + 1)
}
