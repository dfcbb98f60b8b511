package graft.operators

import graft.SparkSpec

class SpectralSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(vs: Seq[Seq[Float]]) =
    vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "vec")

  test("gram: exact decimal cells of a known single-vector corpus") {
    val g = Spectral.gram(corpus(Seq(Seq(1.0f, 2.0f))))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDecimal(2).doubleValue()).toMap
    assert(g == Map((1, 1) -> 1.0, (1, 2) -> 2.0, (2, 1) -> 2.0, (2, 2) -> 4.0))
  }

  test("topComponent: an axis-dominated corpus loads on that axis") {
    val df = Spectral.topComponent(
      corpus(Seq(Seq(3.0f, 0.0f), Seq(2.0f, 0.0f), Seq(0.1f, 0.9f))),
      dims = 2, rounds = 8)
    val rows = df.collect().sortBy(_.getInt(0))
    // max-abs normalization pins the dominant component to exactly ±1e9
    assert(math.abs(rows(0).getLong(1)) == Spectral.vecScale)
    assert(math.abs(rows(1).getLong(1)) < Spectral.vecScale / 2)
  }

  test("topComponent: a rank-1 corpus explains everything (λ = n·|v|², evr = 1)") {
    val df = Spectral.topComponent(
      corpus(Seq(Seq(1.0f, 1.0f), Seq(1.0f, 1.0f))), dims = 2, rounds = 4)
    val r = df.collect().head
    assert(r.getDouble(3) == 4.0)   // eigenvalue = 2 vectors × |(1,1)|²
    assert(r.getDouble(4) == 1.0)   // one direction carries all variance
  }

  test("gramCells delegates to gram; the shared generator form is exchange-minimal") {
    val vecs = corpus(Seq(Seq(0.5f, -1.5f, 2.0f), Seq(1.0f, 0.25f, -0.75f)))
    val a = Spectral.gram(vecs)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDecimal(2)).toMap
    val b = graft.streaming.StreamOps.gramCells(vecs)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDecimal(2)).toMap
    assert(a == b && a.size == 9)
    // r13 verdict item 5: the batch form must be the chained-generator
    // shape — the only KEYED exchange is the d²-row partial-agg shuffle,
    // and the old corpus×d self-join (two hash exchanges + a join) must
    // not come back. An optional narrow round-robin repartition of the
    // raw input rows (the r14 parallelism guard for few-split files) is
    // allowed; a second hash exchange or any join is not.
    val p = Spectral.gram(vecs).queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      s"gram must hash-shuffle only the d² partial-agg cells:\n$p")
    assert(!p.contains("Join"), s"gram must not self-join the corpus:\n$p")
  }

  test("deflate: removes the top direction so iteration finds the second") {
    // corpus [(2,0),(0,1)]: G = diag(4,1) → top = e1 (λ=4), second = e2 (λ=1)
    val cells = Map((1, 1) -> BigInt("4000000000"), (2, 2) -> BigInt("1000000000"))
    val (v1, lam6a, _) = Spectral.powerIteration(cells, 2, rounds = 12)
    // λ₁ = 4 up to one scale-6 unit of truncation (the residual second-axis
    // dust in v₁ biases the Rayleigh quotient down by < 1e-6)
    assert(math.abs(lam6a - 4000000L) <= 1L)
    assert(math.abs(v1(0).toLong) == Spectral.vecScale)
    val g2 = Spectral.deflate(cells, v1, 2)
    val (v2, lam6b, _) = Spectral.powerIteration(g2, 2, rounds = 12)
    assert(math.abs(v2(1).toLong) == Spectral.vecScale) // second axis dominates
    assert(math.abs(v2(0).toLong) < Spectral.vecScale / 100)
    assert(math.abs(lam6b - 1000000L) < 2000) // λ₂ ≈ 1 up to deflation truncation
    // near-orthogonal at scale 1e9
    val dot9 = (0 until 2).map(i => v1(i) * v2(i)).sum / BigInt(Spectral.vecScale)
    assert(dot9.abs < BigInt(Spectral.vecScale) / 100)
  }

  test("deflate: a rank-one matrix deflates to (near) nothing") {
    // corpus [(1,1),(1,1)]: G = [[2,2],[2,2]] — removing the top component
    // leaves only truncation dust, orders below the original trace
    val two = BigInt("2000000000")
    val cells = Map((1, 1) -> two, (1, 2) -> two, (2, 1) -> two, (2, 2) -> two)
    val (v1, _, _) = Spectral.powerIteration(cells, 2, rounds = 4)
    val g2 = Spectral.deflate(cells, v1, 2)
    assert(g2.values.map(_.abs).max < BigInt(1000)) // ≤ µ-units of dust
  }

  test("powerIteration: bounds and degenerate input rejected loudly") {
    intercept[IllegalArgumentException] {
      Spectral.powerIteration(Map((1, 1) -> BigInt("2000000000")), 1, rounds = 0)
    }
    intercept[IllegalArgumentException] { // zero matrix collapses
      Spectral.powerIteration(
        Map((1, 1) -> BigInt(0)), 1, rounds = 2)
    }
  }
}
