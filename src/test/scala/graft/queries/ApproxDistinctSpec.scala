package graft.queries

import graft.SparkSpec

/** Bounds the HLL++ sketch against the exact count — the spec half of the
  * q23 contract (the oracle half hash-compares `exact_users` and the
  * in-envelope boolean).
  */
class ApproxDistinctSpec extends SparkSpec {

  test("q23 approximate distinct stays inside the HLL++ error envelope") {
    val r = CoreQueries.q23raw(spark, sf0001).head()
    val approx = r.getLong(0)
    val exact = r.getLong(1)
    assert(exact > 0)
    // rsd default 0.05; 3 sigma
    assert(math.abs(approx - exact) <= math.max(1L, (exact * 0.15).toLong),
      s"approx=$approx exact=$exact")
  }

  test("q23 oracle-facing boolean is true on real data") {
    val r = CoreQueries.q23(spark, sf0001).head()
    assert(r.getBoolean(1))
  }

  test("q52 sketch intersection: exact counts consistent, estimate inside its envelope") {
    val r = CoreQueries.q52(spark, sf0001).head()
    val (a, b, both) = (r.getLong(0), r.getLong(1), r.getLong(2))
    // set algebra sanity on the exact side
    assert(both <= math.min(a, b))
    assert(a > 0 && b > 0 && both > 0) // 150 users over 30 days: overlap certain
    // the declared envelope boolean (what the oracle pins to true)
    assert(r.getBoolean(3))
  }
}
