package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench contention guard's decision function — pinned so the r10
  * failure class (a contended host shipping inflated medians with no
  * marker) stays closed: the guard must fire on a material >3× spread,
  * stay quiet on steady runs and sub-second jitter, and never treat a
  * failed run as mere noise.
  */
class BenchGuardSpec extends AnyFunSuite {

  test("fires on a material >3x spread") {
    assert(Bench.noisy(Seq(0.5, 0.6, 2.0)))   // 4x, slowest well above 0.5s
    assert(Bench.noisy(Seq(1.0, 1.1, 5.1)))
  }

  test("quiet on steady runs and on sub-second jitter") {
    assert(!Bench.noisy(Seq(1.0, 1.1, 1.2)))  // tight spread
    assert(!Bench.noisy(Seq(0.05, 0.1, 0.4))) // 8x but everything sub-second
    assert(!Bench.noisy(Seq(0.2, 0.2, 0.5)))  // boundary: median not > 0.5
    // the r15 host class: a sub-second-median query whose single outlier
    // run crosses 0.5 s — the shipped median is untouched, not contention
    assert(!Bench.noisy(Seq(0.1, 0.15, 0.9)))
    assert(!Bench.noisy(Seq(0.2, 0.26, 1.1)))
  }

  test("a failed run (-1 sentinel) is broken, not noisy") {
    assert(!Bench.noisy(Seq(-1.0, 1.0, 5.0)))
    assert(!Bench.noisy(Seq.empty))
  }

  test("total on degenerate samples (r16 ADVICE: the guard's domain is any sample)") {
    assert(!Bench.noisy(Seq(5.0)))        // 1 run: no spread to judge
    assert(Bench.noisy(Seq(1.0, 4.0)))    // 2 runs still judged
  }
}
