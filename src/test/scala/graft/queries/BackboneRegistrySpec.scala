package graft.queries

import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Lifecycle contract of the shared backbone cache (r8 ADVICE): builds are
  * single-flight even under concurrent first calls, entries are evictable
  * per session and per key prefix, and the registered frames round-trip.
  */
class BackboneRegistrySpec extends SparkSpec {

  test("getOrBuild caches per key and returns the same frame") {
    val built = new AtomicInteger(0)
    def frame = {
      built.incrementAndGet()
      spark.range(3).withColumn("x", col("id") * 2)
    }
    val a = BackboneRegistry.getOrBuild(spark, "spec:a")(frame)
    val b = BackboneRegistry.getOrBuild(spark, "spec:a")(frame)
    assert(a eq b)
    assert(built.get() == 1)
    assert(a.count() == 3)
    BackboneRegistry.invalidate(spark, "spec:")
  }

  test("concurrent first calls single-flight the build (no leaked double materialization)") {
    val built = new AtomicInteger(0)
    val start = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(8)
    try {
      val futures = (1 to 8).map { _ =>
        pool.submit(new java.util.concurrent.Callable[AnyRef] {
          def call(): AnyRef = {
            start.await(10, TimeUnit.SECONDS)
            BackboneRegistry.getOrBuild(spark, "spec:race") {
              built.incrementAndGet()
              spark.range(5).toDF()
            }
          }
        })
      }
      start.countDown()
      val frames = futures.map(_.get(30, TimeUnit.SECONDS))
      assert(built.get() == 1, s"build ran ${built.get()} times")
      assert(frames.forall(_ eq frames.head))
    } finally {
      pool.shutdownNow()
      BackboneRegistry.invalidate(spark, "spec:")
    }
  }

  test("invalidate drops only the matching prefix, and a dropped key rebuilds") {
    BackboneRegistry.invalidate(spark, "spec:")
    val base = BackboneRegistry.size(spark)
    BackboneRegistry.getOrBuild(spark, "spec:x:1")(spark.range(1).toDF())
    BackboneRegistry.getOrBuild(spark, "spec:y:1")(spark.range(1).toDF())
    assert(BackboneRegistry.size(spark) == base + 2)
    BackboneRegistry.invalidate(spark, "spec:x:")
    assert(BackboneRegistry.size(spark) == base + 1)
    // rebuild after invalidation really rebuilds
    val built = new AtomicInteger(0)
    BackboneRegistry.getOrBuild(spark, "spec:x:1") {
      built.incrementAndGet(); spark.range(2).toDF()
    }
    assert(built.get() == 1)
    BackboneRegistry.invalidate(spark, "spec:")
    assert(BackboneRegistry.size(spark) == base)
  }

  test("family backbones register under their session (evictable, not JVM-pinned)") {
    // touching a text backbone must leave a registry entry keyed by this
    // session — the eviction listener can then release it on stop
    TextBackbone.unigrams(spark, sf0001).limit(1).count()
    assert(BackboneRegistry.size(spark) >= 1)
  }
}
