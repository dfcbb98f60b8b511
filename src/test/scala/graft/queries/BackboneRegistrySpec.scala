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

  test("staged-name resolutions cache per session, revalidate via the live probe, and evict with clearSession") {
    val s2 = spark.newSession()
    val built = new AtomicInteger(0)
    def resolve(live: Boolean) =
      BackboneRegistry.namesOrBuild(s2, "spec:names")(_ => live) {
        built.incrementAndGet(); Seq("t1", "t2")
      }
    assert(resolve(live = true) == Seq("t1", "t2"))
    assert(resolve(live = true) == Seq("t1", "t2") && built.get() == 1)
    // a failed liveness probe (fresh catalog) rebuilds instead of trusting
    // the cached names
    assert(resolve(live = false) == Seq("t1", "t2") && built.get() == 2)
    assert(BackboneRegistry.namesSize(s2) == 1)
    // the session's entries are GONE after the (listener-invoked) clear —
    // and the parent session's caches are untouched
    val parentNames = BackboneRegistry.namesSize(spark)
    val parentFrames = BackboneRegistry.size(spark)
    BackboneRegistry.clearSession(s2)
    assert(BackboneRegistry.namesSize(s2) == 0)
    assert(BackboneRegistry.namesSize(spark) == parentNames)
    assert(BackboneRegistry.size(spark) == parentFrames)
  }

  test("the staging call sites route their name caches through the registry (r9 TrieMap leak closed)") {
    // no file in graft.queries holds a session-keyed TrieMap anymore — the
    // registry owns every (session, dir) resolution and its eviction
    val srcDir = new java.io.File("src/main/scala/graft/queries")
    val offenders = srcDir.listFiles().filter(_.getName.endsWith(".scala")).filter { f =>
      val txt = new String(java.nio.file.Files.readAllBytes(f.toPath))
      f.getName != "BackboneRegistry.scala" && txt.contains("TrieMap[(SparkSession")
    }.map(_.getName)
    assert(offenders.isEmpty, s"session-keyed TrieMaps outside the registry: ${offenders.toSeq}")
    // and exercising a staged query leaves its resolution in the registry
    val before = BackboneRegistry.namesSize(spark)
    BucketedQueries.q31(spark, sf0001).limit(1).count()
    assert(BackboneRegistry.namesSize(spark) >= math.max(before, 1))
  }

  test("derived scalars cache per session and evict with clearSession") {
    val s2 = spark.newSession()
    val built = new AtomicInteger(0)
    def n = BackboneRegistry.scalarOrBuild(s2, "spec:scalar") {
      built.incrementAndGet(); 42L
    }
    assert(n == 42L && n == 42L && built.get() == 1)
    BackboneRegistry.clearSession(s2)
    assert(BackboneRegistry.scalarOrBuild(s2, "spec:scalar") { 7L } == 7L)
    BackboneRegistry.clearSession(s2)
  }
}
