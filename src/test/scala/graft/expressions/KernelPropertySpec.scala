package graft.expressions

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property-based checks over the pure kernels (no Spark session needed) —
  * the invariants the operators lean on, exercised over generated inputs
  * instead of fixtures. Raw ScalaCheck (the scalatest bridge isn't on the
  * offline classpath).
  */
class KernelPropertySpec extends AnyFunSuite {

  private def check(p: Prop, n: Int = 50): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  test("bloom: NO false negative for any key set and any probe of it") {
    check(Prop.forAll(Gen.listOf(Gen.long)) { keys =>
      val words = new Array[Long](Bloom.wordsFor(math.max(1, keys.length).toLong))
      keys.foreach(Bloom.set(words, Bloom.defaultHashes, _))
      val blob = Bloom.serialize(words, Bloom.defaultHashes)
      keys.forall(Bloom.mightContain(blob, _))
    })
  }

  test("bloom: merge (bitwise OR) equals building from the union") {
    check(Prop.forAll(Gen.listOf(Gen.long), Gen.listOf(Gen.long)) { (a, b) =>
      val n = math.max(1, a.length + b.length).toLong
      val wa = new Array[Long](Bloom.wordsFor(n))
      val wb = new Array[Long](Bloom.wordsFor(n))
      val wu = new Array[Long](Bloom.wordsFor(n))
      a.foreach(Bloom.set(wa, Bloom.defaultHashes, _))
      b.foreach(Bloom.set(wb, Bloom.defaultHashes, _))
      (a ++ b).foreach(Bloom.set(wu, Bloom.defaultHashes, _))
      wa.zip(wb).map { case (x, y) => x | y }.toSeq == wu.toSeq
    }, n = 30)
  }

  test("bloom: serialize/deserialize round-trips any filter") {
    check(Prop.forAll(Gen.listOf(Gen.long), Gen.choose(1, 16)) { (keys, k) =>
      val words = new Array[Long](Bloom.wordsFor(math.max(1, keys.length).toLong))
      keys.foreach(Bloom.set(words, k, _))
      val (w2, k2) = Bloom.deserialize(Bloom.serialize(words, k))
      k2 == k && w2.toSeq == words.toSeq
    }, n = 30)
  }

  test("splitmix64 finalizer spreads dense id ranges without collisions") {
    // dense surrogate-id ranges (the TPC-H key shape) must spread without
    // collisions — splitmix64 is invertible, so equal outputs imply equal inputs
    check(Prop.forAll(Gen.choose(-1000000L, 1000000L)) { base =>
      (base until base + 1000L).map(Bloom.mix).distinct.length == 1000
    }, n = 20)
  }
}
