package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.TableIdentifier
import org.apache.spark.sql.functions._

import graft.SparkSpec

class StagingSpec extends SparkSpec {
  import spark.implicits._

  private def freshName(tag: String) =
    s"stg_spec_${tag}_${java.lang.Long.toUnsignedString(System.nanoTime(), 36)}"

  private def df = Seq((1L, "a"), (2L, "b"), (3L, "c"), (17L, "d"))
    .toDF("k", "v")

  private def warehousePath(table: String) = new Path(
    spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)

  private val fs = new Path(spark.conf.get("spark.sql.warehouse.dir"))
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  test("ensure stages once, then serves the cached table without re-staging") {
    val t = freshName("once")
    val fp = Staging.fingerprint(spark, sf0001, "spec:once")
    var stagings = 0
    def run() = Staging.ensure(spark, fp, Seq(t)) {
      stagings += 1
      Bucketing.writeBucketed(df, t, "k", 4)
    }
    run(); run()
    assert(stagings === 1, "second ensure must hit the live-catalog fast path")
    assert(spark.table(t).count() === 4)
  }

  test("a prior JVM's files + marker re-register without re-staging (cross-JVM path)") {
    val a = freshName("src")
    val fpA = Staging.fingerprint(spark, sf0001, "spec:xjvm")
    Staging.ensure(spark, fpA, Seq(a)) { Bucketing.writeBucketed(df, a, "k", 4) }

    // Simulate what a fresh JVM sees: warehouse files + marker present, but
    // the (in-memory) catalog has never heard of the table. Copying the
    // staged location to a name this catalog doesn't know reproduces that
    // state exactly — the marker's fingerprint doesn't embed the table name.
    val b = freshName("dst")
    org.apache.hadoop.fs.FileUtil.copy(
      fs, warehousePath(a), fs, warehousePath(b), false, true,
      spark.sparkContext.hadoopConfiguration)

    Staging.ensure(spark, fpA, Seq(b)) {
      fail("register path must not re-stage when the marker matches")
    }
    // registered table serves the same rows AND keeps its bucket spec
    assert(spark.table(b).orderBy("k").collect().toSeq ===
      spark.table(a).orderBy("k").collect().toSeq)
    val bs = spark.sessionState.catalog.getTableMetadata(TableIdentifier(b)).bucketSpec
    assert(bs.isDefined && bs.get.numBuckets === 4 &&
      bs.get.bucketColumnNames === Seq("k"),
      s"re-registered table lost its bucket spec: $bs")
  }

  test("a stale fingerprint forces a re-stage, never serves old data") {
    val t = freshName("stale")
    val fp1 = Staging.fingerprint(spark, sf0001, "spec:v1")
    Staging.ensure(spark, fp1, Seq(t)) { Bucketing.writeBucketed(df, t, "k", 4) }
    // same table, new recipe fingerprint (as if the config or data changed)
    val fp2 = Staging.fingerprint(spark, sf0001, "spec:v2")
    var restaged = false
    Staging.ensure(spark, fp2, Seq(t)) {
      restaged = true
      Bucketing.writeBucketed(df.withColumn("v", lit("new")), t, "k", 4)
    }
    assert(restaged, "fingerprint change must invalidate the staged artifact")
    assert(spark.table(t).select("v").distinct().collect().map(_.getString(0)).toSeq === Seq("new"))
  }

  test("a torn stage (no marker) is re-staged, not reused") {
    val t = freshName("torn")
    val fp = Staging.fingerprint(spark, sf0001, "spec:torn")
    Staging.ensure(spark, fp, Seq(t)) { Bucketing.writeBucketed(df, t, "k", 4) }
    // simulate a crash between saveAsTable and the marker write: files
    // present, marker missing, catalog fresh (drop the catalog entry too)
    fs.delete(new Path(warehousePath(t), "_graft_staged.props"), false)
    val copy = freshName("torncopy")
    org.apache.hadoop.fs.FileUtil.copy(
      fs, warehousePath(t), fs, warehousePath(copy), false, true,
      spark.sparkContext.hadoopConfiguration)
    var restaged = false
    Staging.ensure(spark, fp, Seq(copy)) {
      restaged = true
      Bucketing.writeBucketed(df, copy, "k", 4)
    }
    assert(restaged, "a location without a marker must never be trusted")
    assert(spark.table(copy).count() === 4)
  }

  test("the marker file is invisible to table reads") {
    val t = freshName("marker")
    val fp = Staging.fingerprint(spark, sf0001, "spec:marker")
    Staging.ensure(spark, fp, Seq(t)) { Bucketing.writeBucketed(df, t, "k", 4) }
    assert(fs.exists(new Path(warehousePath(t), "_graft_staged.props")))
    assert(spark.table(t).count() === 4) // would fail if the props file were scanned
  }

  test("fingerprint moves with source-data changes and config changes") {
    val base = Staging.fingerprint(spark, sf0001, "spec:fp")
    assert(Staging.fingerprint(spark, sf0001, "spec:fp") === base, "deterministic")
    assert(Staging.fingerprint(spark, sf0001, "spec:fp2") !== base, "config-sensitive")
    assert(Staging.fingerprint(spark, "/root/testdata/sf0.01", "spec:fp") !== base,
      "data-sensitive")
  }
}
