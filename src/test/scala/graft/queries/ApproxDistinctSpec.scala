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
}
