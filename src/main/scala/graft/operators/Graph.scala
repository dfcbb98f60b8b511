package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Whole-graph analytics over edge lists — the family that complements
  * [[Dedup.connectedComponents]] (membership) with IMPORTANCE (PageRank) and
  * SHAPE (degree profile). No GraphX, no RDDs: edges are a DataFrame, every
  * round is an equi-join + partial-aggregable groupBy, so Catalyst/AQE plan
  * each round like any other relational stage.
  *
  * Scale shape: the routing table (edges + out-degree) is built ONCE,
  * `localCheckpoint`ed, and re-joined per round; ranks are one row per node
  * (always ≤ the edge count), so each of the fixed `iters` rounds shuffles
  * |edges| contributions and |nodes| rank rows — identical to one groupBy-sum
  * over the edges, times a small constant. Nothing driver-side but the node
  * count (one scalar action).
  *
  * Determinism contract (the reason this matches a SQL oracle bit-for-bit):
  * rank mass is INTEGER micro-units (1e15 = total graph mass), per-edge
  * contributions are integer division by out-degree, and the damping mix is
  * integer arithmetic too — every round is exact and order-independent in
  * both engines, where double (or even double→decimal-cast) sums would
  * drift with partition order or engine conversion rules. The sub-resolution
  * mass shed by the integer divisions (< deg·1e-15 per node per round) is
  * part of the algorithm's definition, not noise. Floats appear only in the
  * final normalized display column.
  */
object Graph {

  /** Total rank mass in micro-units: 1e15 keeps per-node ranks ≥ 1e6 units
    * for graphs up to ~1e9 nodes (9 orders of magnitude of resolution) while
    * per-destination contribution sums stay ≤ 1e15 — no BIGINT overflow at
    * ANY node count, because the per-round global mass is conserved.
    */
  val massUnits = 1000000000000000L

  /** Damping as an integer percentage so the mix stays exact. */
  val dampingPct = 85L

  /** PageRank over an UNDIRECTED graph given as distinct directed pairs
    * (the caller's edge derivation dedups; this symmetrizes). Fixed
    * iteration count — on 100 TB you run the budgeted number of rounds and
    * ship, rather than gating a 1000-executor job on a convergence probe.
    *
    * `mirrorDisjoint = true` declares that src and dst draw from DISJOINT
    * id domains (the parity-encoded bipartite callers: src even, dst odd),
    * so `p ∪ p.reverse` cannot contain duplicates and the symmetrizing
    * `distinct` — a full exchange + aggregate over the edge list, per call
    * — is skipped (r17, guide §2.4 "a distinct on data that is already
    * unique"; the oracles' UNION ALL encode the same fact).
    *
    * Returns the (node, u) frame (u in micro-units) plus the node count, so
    * callers can render [[normalized]] without re-counting the graph.
    */
  def pagerank(pairs: DataFrame, iters: Int,
               mirrorDisjoint: Boolean = false,
               nOpt: Option[Long] = None): (DataFrame, Long) = {
    require(iters >= 1 && iters <= 50, s"iters must be in [1,50], got $iters")
    // r16: no eager checkpoint of the raw pair projection — callers pass
    // the backbone-checkpointed edge frame, and the only consumer (`routed`)
    // is itself eagerly checkpointed right below
    val p = pairs.select(col("src"), col("dst"))
    val mirrored = p.union(p.select(col("dst"), col("src")))
    val sym = if (mirrorDisjoint) mirrored else mirrored.distinct()
    // routing table: every directed edge with its source's out-degree.
    // Window(partitionBy src) instead of groupBy+self-join: one shuffle, and
    // the result is already hash-partitioned by src — the join key every
    // round reuses.
    val routed = sym
      .withColumn("deg",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window.partitionBy("src")))
      .localCheckpoint(true)
    // node count: a pure scalar of the edge list — callers that derive it
    // from a session-cached backbone pass it (r17, the bfs-seed/kcore-
    // threshold pattern) so repeat calls skip this aggregate job
    val n = nOpt.getOrElse(
      routed.select(countDistinct(col("src"))).first().getLong(0))
    require(n > 0, "pagerank on an empty edge list")
    val baseU = massUnits * (100L - dampingPct) / 100L / n
    var ranks = routed.select(col("src").as("node")).distinct()
      .withColumn("u", lit(massUnits / n))
    for (_ <- 1 to iters) {
      ranks = routed
        .join(ranks, routed("src") === ranks("node"))
        .select(col("dst"), expr("u div deg").as("c"))
        .groupBy("dst")
        .agg(sum("c").as("s"))
        .select(col("dst").as("node"),
          (lit(baseU) + expr(s"(s * $dampingPct) div 100")).as("u"))
      // every node has in-edges (symmetric graph), so no dangling-mass term
      // and no outer join: rank mass that a directed formulation would lose
      // to sinks cannot exist here.
    }
    (ranks, n)
  }

  /** Conventional mean-1.0 normalized rank from micro-units: u·n / 1e15. */
  def normalized(ranks: DataFrame, n: Long): DataFrame =
    ranks.select(col("node"),
      round(col("u").cast("double") * lit(n) / lit(1.0e15), 6).as("rank"))

  /** Personalized PageRank: identical integer micro-unit contract to
    * [[pagerank]], but the restart mass returns to the SEED SET instead of
    * spreading uniformly — the "importance relative to THESE nodes" reading
    * (seed-biased crawl weighting, account-centric influence, related-item
    * ranking) that global PageRank cannot express. `seeds` is a bounded
    * (node) frame; `seedCount` is its size, passed by the caller so no
    * scalar action runs here.
    *
    * Shape difference from the global walk: rank support GROWS outward from
    * the seeds (round k touches only nodes within k hops), so early rounds
    * shuffle |reached ⋈ edges| rows, not |edges| — on 100 TB a seeded walk
    * over a localized neighborhood never pays the whole graph. The per-round
    * union-then-sum (damped in-contributions ⊎ seed restart rows, one
    * partial-aggregable groupBy) replaces the global formulation's
    * "base + damped sum" projection because a seed with no reached
    * in-neighbor must still hold its restart mass — an outer join would say
    * the same thing with a worse plan.
    */
  def personalizedPagerank(pairs: DataFrame, seeds: DataFrame, seedCount: Long,
      iters: Int, mirrorDisjoint: Boolean = false): DataFrame = {
    require(iters >= 1 && iters <= 50, s"iters must be in [1,50], got $iters")
    require(seedCount > 0, "personalized pagerank needs a non-empty seed set")
    val p = pairs.select(col("src"), col("dst"))
    val mirrored = p.union(p.select(col("dst"), col("src")))
    // same contract as [[pagerank]]'s mirrorDisjoint (r17)
    val sym = if (mirrorDisjoint) mirrored else mirrored.distinct()
    val routed = sym
      .withColumn("deg",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window.partitionBy("src")))
      .localCheckpoint(true)
    val sd = seeds.select(col("node")).localCheckpoint(true)
    val baseU = massUnits * (100L - dampingPct) / 100L / seedCount
    var ranks = sd.withColumn("u", lit(massUnits / seedCount))
    for (_ <- 1 to iters) {
      val damped = routed
        .join(ranks, routed("src") === ranks("node"))
        .select(col("dst"), expr("u div deg").as("c"))
        .groupBy("dst")
        .agg(sum("c").as("s"))
        .select(col("dst").as("node"), expr(s"(s * $dampingPct) div 100").as("u0"))
      val restart = sd.withColumn("u0", lit(baseU))
      ranks = damped.union(restart)
        .groupBy("node").agg(sum("u0").as("u"))
    }
    ranks
  }

  /** Common-neighbor (co-occurrence) similarity over a bipartite edge list
    * (group, item): item pairs sharing groups, scored by the overlap
    * coefficient `common / min(deg_a, deg_b)` — co-purchase similarity,
    * "suppliers serving the same customers", any market-basket reading.
    *
    * Scale discipline: the pair explosion is quadratic IN THE GROUP SIZE, so
    * groups larger than `cap` are dropped deterministically (the occupancy
    * rule every capped operator here shares) — worst case #groups·cap²
    * candidate rows into a partial-aggregable count, never corpus².
    */
  def commonNeighbors(edges: DataFrame, cap: Int): DataFrame = {
    require(cap >= 2, s"cap must allow pairs, got $cap")
    // NO eager checkpoint (r17, guide §5): the three consumers below — deg
    // and both self-join sides — share IDENTICAL subtrees up to this frame,
    // so ReuseExchange computes the distinct/window exchanges once within
    // the single action; the checkpoint bought the same sharing for two
    // extra driver-paced materialization jobs per call.
    val e = edges.select(col("g"), col("i")).distinct()
      .withColumn("_k",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window.partitionBy("g")))
      .filter(col("_k") <= cap)
      .drop("_k")
    val deg = e.groupBy("i").agg(count(lit(1)).as("d"))
    val pairs = e.as("a")
      .join(e.select(col("g"), col("i").as("i2")).as("b"),
        col("a.g") === col("b.g") && col("a.i") < col("i2"))
      .groupBy(col("a.i").as("i1"), col("i2"))
      .agg(count(lit(1)).as("common"))
    pairs
      .join(deg.select(col("i").as("i1"), col("d").as("d1")), "i1")
      .join(deg.select(col("i").as("i2"), col("d").as("d2")), "i2")
      .select(col("i1"), col("i2"), col("common"),
        round(col("common").cast("double") / least(col("d1"), col("d2")), 6)
          .as("overlap"))
  }

  /** Triangle census of an undirected graph (columns `a`, `b`): node/edge
    * counts, wedge count (Σ d(d−1)/2), triangle count, and the global
    * clustering coefficient 3·triangles/wedges.
    *
    * The enumeration is DEGREE-ORDERED: every edge is oriented toward its
    * (degree, id)-larger endpoint, so each triangle {a<b<c in rank} is
    * counted exactly once — from its lowest-rank edge (a,b), as a member
    * of `N⁺(a) ∩ N⁺(b)`. Orientation is what makes this scale: a hub of
    * degree d keeps out-degree O(√m), bounding total intersection work by
    * O(m^1.5) (arboricity) instead of Σ d² — the classic result a naive
    * a<b<c self-join does not have.
    *
    * The closure is EDGE-CENTRIC over per-pivot adjacency ARRAYS (the r9
    * verdict's lever 2): out-neighbor lists are collected once per node,
    * each oriented edge picks up both endpoints' arrays by equi-join, and
    * the triangle count is `size(array_intersect(N⁺(u), N⁺(v)))` evaluated
    * in the join's project — wedge candidates NEVER exist as rows, so the
    * plan's former dominant exchange (tens of millions of wedge rows
    * hashed into a LEFT SEMI probe) collapses to shuffling |edges| rows
    * whose array payloads total the adjacency table. Same asymptotics,
    * ~an order of magnitude fewer shuffle records on the suite's
    * heaviest graph stage.
    */
  def triangleStats(edges: DataFrame): DataFrame = {
    // ids normalized to LONG here (INT-typed frames stay legal — the r9
    // ADVICE class) so the sorted-merge closure expression sees one type
    val und = edges
      .select(least(col("a"), col("b")).cast("long").as("a"),
        greatest(col("a"), col("b")).cast("long").as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
      // no eager checkpoint here (r17): every consumer of this frame (deg,
      // orientation, n_edges) carries the identical distinct-exchange
      // subtree — ReuseExchange materializes it once where the checkpoint
      // paid an extra driver-paced job (A/B: und-only 14 jobs, o-only 16,
      // none 13; the one pin that PAID is adj below, whose post-exchange
      // aggregation is what actually re-ran)
    val deg = und.select(col("a").as("v")).union(und.select(col("b").as("v")))
      .groupBy("v").agg(count(lit(1)).as("d"))
    val e = und
      .join(deg.select(col("v").as("a"), col("d").as("da")), "a")
      .join(deg.select(col("v").as("b"), col("d").as("db")), "b")
    val o = e.select(
      when(col("da") < col("db") || (col("da") === col("db") && col("a") < col("b")),
        struct(col("a").as("u"), col("b").as("v")))
        .otherwise(struct(col("b").as("u"), col("a").as("v"))).as("t"))
      .select(col("t.u").as("u"), col("t.v").as("v"))
      // no eager checkpoint (r17): both consumers (adjacency build, closure
      // edge scan) share this subtree's exchanges via ReuseExchange
    // adjacency lists SORTED at build so the per-edge closure count is a
    // two-pointer merge (SortedLongIntersectCount) — O(m^1.5) evaluations
    // pay no per-call hash set (the r13 profile fix, same as the dedup
    // verify's digest arrays)
    // the ONE checkpoint the census keeps (r17, A/B'd over four shapes):
    // ReuseExchange shares the groupBy EXCHANGE between the two closure-join
    // sides, but the post-exchange aggregation — collect_list + array_sort
    // over every adjacency list — re-ran once PER SIDE without a pin
    // (probed: adj-only 1.72 s steady vs 1.92 s none, 2.32 s with the r16
    // triple; checkpointing und or o instead measured worse than none)
    val adj = o.groupBy("u").agg(array_sort(collect_list("v")).as("nb"))
      .localCheckpoint(true)
    // inner joins are exact: an endpoint absent from adj has no out-edges
    // and contributes an empty intersection anyway
    val tri = o
      .join(adj.select(col("u"), col("nb").as("nu")), Seq("u"))
      .join(adj.select(col("u").as("v"), col("nb").as("nv")), Seq("v"))
      .select(org.apache.spark.sql.graftbridge.ColumnBridge.column(
        graft.expressions.SortedLongIntersectCount(
          org.apache.spark.sql.graftbridge.ColumnBridge.expression(col("nu")),
          org.apache.spark.sql.graftbridge.ColumnBridge.expression(col("nv"))))
        .as("t"))
      .agg(coalesce(sum("t"), lit(0L)).as("triangles")) // empty graph → 0
    val shape = deg.agg(count(lit(1)).as("n_nodes"),
      sum(expr("(d * (d - 1)) div 2")).as("wedges"))
    val nEdges = und.agg(count(lit(1)).as("n_edges"))
    shape.crossJoin(broadcast(nEdges)).crossJoin(broadcast(tri))
      .select(col("n_nodes"), col("n_edges"), col("wedges"), col("triangles"),
        round(col("triangles") * 3.0 / col("wedges"), 6).as("gcc"))
  }

  /** Degree profile of the same symmetrized graph: how many nodes have each
    * degree — the one-scan shape check (hubs? saturation? orphan shards?)
    * run before committing to a join strategy on an unknown graph.
    */
  def degreeProfile(pairs: DataFrame, mirrorDisjoint: Boolean = false): DataFrame = {
    val p = pairs.select(col("src"), col("dst"))
    val mirrored = p.union(p.select(col("dst"), col("src")))
    // same contract as [[pagerank]]'s mirrorDisjoint (r17)
    val sym = if (mirrorDisjoint) mirrored else mirrored.distinct()
    sym.groupBy("src").agg(count(lit(1)).as("degree"))
      .groupBy("degree").agg(count(lit(1)).as("n_nodes"))
  }

  /** Data-derived k-core threshold: `max(2, floor(median(degree)))` over
    * the normalized graph's degrees. The median is EXACT (`percentile`, which
    * interpolates the even-count midpoint exactly like the SQL engines'
    * `quantile_cont`) and its inputs are integers, so the interpolated value
    * is either an integer or an integer + 0.5 — both exactly representable,
    * so `floor` lands identically in every engine. A fixed k cannot serve a
    * graph family whose density grows with the corpus; the median degree
    * tracks the graph's own scale, splitting it at its typical node.
    */
  def coreThreshold(edges: DataFrame): Long = {
    val und = normalizeUndirected(edges)
    val deg = und.select(col("a").as("v")).union(und.select(col("b").as("v")))
      .groupBy("v").agg(count(lit(1)).as("dg"))
    val med = deg.agg(expr("percentile(dg, 0.5)")).first().getDouble(0)
    math.max(2L, math.floor(med).toLong)
  }

  /** k-core peel trajectory: `rounds` synchronous peeling steps, each
    * dropping every node whose CURRENT degree is below `k` and every edge
    * touching a dropped node. Emits one row per round —
    * `(round, k, nodes, edges)` where `nodes` counts the survivors entering
    * the round's edge set and `edges` the undirected edges among them — so
    * the whole trajectory (not just the fixpoint) is oracle-checkable, and a
    * converged peel keeps producing identical rows (idempotent by
    * definition, so a fixed round budget loses nothing).
    *
    * Scale shape (the same discipline as [[pagerank]]): each round is one
    * partial-aggregable degree count plus two hash joins against the
    * one-column survivor set — |E| rows through node-keyed exchanges, never
    * a pair explosion — and the surviving edge set is eagerly checkpointed
    * so round r never replays rounds 1..r−1. Driver traffic is two scalar
    * counts per round. On 100 TB you budget the rounds (peeling converges in
    * O(log n) synchronous steps on real graphs) exactly as PageRank budgets
    * its iterations.
    */
  def kcorePeel(edges: DataFrame, k: Long, rounds: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(rounds >= 1 && rounds <= 20, s"rounds must be in [1,20], got $rounds")
    val spark = edges.sparkSession
    import spark.implicits._
    val und = normalizeUndirected(edges)
    var sym = und.union(und.select(col("b").as("a"), col("a").as("b")))
      .toDF("src", "dst")
      .localCheckpoint(true)
    val out = Seq.newBuilder[(Int, Long, Long, Long)]
    for (r <- 1 to rounds) {
      // ONE eager materialization per round (r17, the bfs discipline): the
      // survivor set stays LAZY — its two join probes carry identical
      // degree-aggregate subtrees, so ReuseExchange materializes that
      // shuffle once inside the round's checkpoint job where the old
      // per-round survivor checkpoint paid a second driver-paced job. The
      // trajectory's `nodes` count re-derives the survivor filter from the
      // PREVIOUS round's checkpointed frame (one aggregate over pinned
      // blocks) instead of counting a materialized survivor copy.
      val prev = sym
      val survivors = prev.groupBy("src").agg(count(lit(1)).as("dg"))
        .filter(col("dg") >= k)
        .select(col("src").as("v"))
      sym = prev
        .join(survivors.select(col("v").as("src")), Seq("src"))
        .join(survivors.select(col("v").as("dst")), Seq("dst"))
        .select(col("src"), col("dst"))
        .localCheckpoint(true)
      // both trajectory scalars in ONE action: the survivor count and the
      // (trivial, already-pinned) edge count cross-join into a single row
      val row = survivors.agg(count(lit(1)).as("nodes"))
        .crossJoin(sym.agg(count(lit(1)).as("dirEdges")))
        .head()
      out += ((r, k, row.getLong(0), row.getLong(1) / 2))
    }
    out.result().toDF("round", "k", "nodes", "edges")
  }

  /** Synchronous label propagation: `rounds` steps of "adopt the most
    * frequent label among your neighbors" with the DETERMINISTIC tie rule
    * (highest count, then smallest label) that makes the whole run — not
    * just a fixpoint — oracle-comparable. Labels start as node ids; returns
    * (node, lbl) after the fixed budget. Community detection as pure
    * relational rounds: each step is one |E|-row equi-join + two
    * partial-aggregable groupBys (label frequencies per node, then the
    * struct-min argmax — `min(struct(-count, label))`, a total order, so no
    * engine's hash order can influence the pick), labels eagerly
    * checkpointed per round (the PageRank discipline). Sync LPA can
    * oscillate on bipartite-ish structures — the fixed budget reports
    * whatever round R says, identically everywhere, rather than gating a
    * 1000-executor job on a convergence probe.
    */
  def labelPropagation(edges: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1 && rounds <= 20, s"rounds must be in [1,20], got $rounds")
    val und = normalizeUndirected(edges)
    val sym = und.union(und.select(col("b").as("a"), col("a").as("b")))
      .toDF("src", "dst")
      .localCheckpoint(true)
    var labels = sym.select(col("src").as("node")).distinct()
      .withColumn("lbl", col("node"))
    for (_ <- 1 to rounds) {
      labels = sym
        .join(labels, sym("src") === labels("node"))
        .groupBy(col("dst"), col("lbl"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("dst").as("node"))
        .agg(min(struct((-col("c")).as("nc"), col("lbl").as("l"))).as("m"))
        .select(col("node"), col("m.l").as("lbl"))
      // r17: rounds chain LAZILY off the one checkpointed edge frame (the
      // pagerank shape) — each per-round eager checkpoint was a driver-paced
      // materialization job buying nothing: the bounded round count keeps
      // the lineage shallow, and AQE materializes each round's exchanges
      // exactly once inside the single action.
    }
    labels
  }

  /** Budgeted BFS levels from `sources` over the symmetrized graph: the
    * frontier-expansion primitive (reachability, blast-radius, "how far is
    * everything from the seed set") the importance/shape family lacked.
    * Each round is one equi-join (frontier → neighbors), one distinct, and
    * one anti-join against the visited set — all partial-aggregable /
    * shuffle-on-key stages, round-checkpointed like [[kcorePeel]] so the
    * lineage stays flat. Work per round ∝ |frontier ⋈ edges|; the budget is
    * fixed (100 TB discipline: run the planned rounds and ship — a
    * convergence probe would gate a 1000-executor job on a scalar action
    * per round anyway, and an exhausted frontier makes the remaining rounds
    * free). Levels are exact integers (min-hop by construction: a node
    * enters `visited` the first round it is reachable, the anti-join keeps
    * later sightings out), so the result is engine-exact against a
    * recursive-CTE oracle with no arithmetic caveats.
    */
  def bfsLevels(pairs: DataFrame, sources: DataFrame, rounds: Int,
                mirrorDisjoint: Boolean = false): DataFrame = {
    require(rounds >= 1 && rounds <= 20, s"rounds must be in [1,20], got $rounds")
    val p = pairs.select(col("src"), col("dst"))
    val mirrored = p.union(p.select(col("dst").as("src"), col("src").as("dst")))
    // same contract as [[pagerank]]'s mirrorDisjoint (r17)
    val sym = (if (mirrorDisjoint) mirrored else mirrored.distinct())
      .localCheckpoint(true)
    // r16: ONE eager materialization per round (the new frontier), not two —
    // the visited set is the union of the already-checkpointed per-round
    // frames, so re-checkpointing it only re-copied every earlier level
    // each round (rounds² blocks over the walk). The union's lineage stays
    // flat: every leg is a checkpointed frame.
    var visitedParts = List(sources.select(col("node"))
      .withColumn("level", lit(0L)).localCheckpoint(true))
    var frontier = visitedParts.head.select("node")
    for (k <- 1 to rounds) {
      val visited = visitedParts.map(_.select("node")).reduce(_ union _)
      val next = frontier.join(sym, frontier("node") === sym("src"))
        .select(col("dst").as("node"))
        .distinct()
        .join(visited, Seq("node"), "left_anti")
        .withColumn("level", lit(k.toLong))
        .localCheckpoint(true)
      visitedParts = visitedParts :+ next
      frontier = next.select("node")
    }
    visitedParts.reduce(_ union _)
  }

  /** Canonical undirected edge list: (min, max) per pair, self-loops and
    * duplicates removed — the normalization [[triangleStats]] applies inline,
    * shared by the peeling family.
    */
  private def normalizeUndirected(edges: DataFrame): DataFrame =
    edges
      .select(least(col("a"), col("b")).as("a"), greatest(col("a"), col("b")).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
}
