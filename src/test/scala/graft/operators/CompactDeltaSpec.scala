package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[Bucketing.compactDelta]] is table service ∝ appended data: it must
  * rewrite EXACTLY the multi-file buckets — returning which — leave every
  * clean bucket's file untouched on disk, lose/duplicate nothing, and
  * restore the scan's reported ordering (sort elision) that the append
  * voided.
  */
class CompactDeltaSpec extends SparkSpec {

  private val buckets = 8
  private val sortCols = Seq("k", "ts", "id")

  private def fixture(n: Int, keys: Seq[String], idBase: Long): DataFrame = {
    val ks = keys.map(k => s"'$k'").mkString(",")
    spark.range(n).selectExpr(
      s"element_at(array($ks), cast(id % ${keys.size} AS INT) + 1) AS k",
      s"timestamp_micros(1700000000000000 + (id + $idBase) * 1000000) AS ts",
      s"id + $idBase AS id",
      "cast(id AS DOUBLE) / 3 AS v")
  }

  private def warehouseFiles(table: String): Map[String, Long] = {
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(loc).filter(f => f.isFile && !f.getPath.getName.startsWith("_"))
      .map(f => f.getPath.getName -> f.getLen).toMap
  }

  private def localSorts(df: DataFrame): Int =
    "\\], false, 0".r.findAllIn(df.queryExecution.executedPlan.toString).size

  private def windowed(table: String): DataFrame = {
    val w = Window.partitionBy("k").orderBy("ts", "id")
    Bucketing.read(spark, table)
      .withColumn("prev", lag("v", 1).over(w))
  }

  test("rewrites exactly the dirty buckets; clean files byte-untouched; no rows lost") {
    val t = "graft_test_cdelta"
    val base = fixture(800, Seq("a", "b", "c", "d", "e", "f"), 0L)
    Bucketing.writeBucketedSorted(base, t, "k", sortCols, buckets)
    val before = warehouseFiles(t)
    assert(localSorts(windowed(t)) == 0, "staged table must elide the sort")

    // a late batch from two sources only → at most two dirty buckets
    val batch = fixture(120, Seq("b", "e"), 10000L)
    Bucketing.appendBucketed(batch, t, "k", buckets, sortCols)
    assert(localSorts(windowed(t)) > 0, "append must void the reported order")
    val dirty = warehouseFiles(t).keys
      .groupBy(n => Bucketing.bucketIdOf(n).get).filter(_._2.size >= 2).keySet
    assert(dirty.nonEmpty && dirty.size <= 2)

    val rewritten = Bucketing.compactDelta(spark, t, "k", sortCols, buckets)
    assert(rewritten == dirty, s"must rewrite exactly $dirty, got $rewritten")

    val after = warehouseFiles(t)
    // every bucket back to one file
    assert(after.keys.groupBy(n => Bucketing.bucketIdOf(n).get)
      .forall(_._2.size == 1), s"buckets still multi-file: $after")
    // clean buckets' files are the SAME files (name and length)
    val cleanBefore = before.filter { case (n, _) =>
      !dirty(Bucketing.bucketIdOf(n).get) }
    cleanBefore.foreach { case (n, len) =>
      assert(after.get(n).contains(len), s"clean file $n was touched") }
    // ordering restored, content exact
    assert(localSorts(windowed(t)) == 0, "compaction must restore sort elision")
    val got = Bucketing.read(spark, t).orderBy("k", "ts", "id").collect().toSeq
    val want = base.unionByName(batch).orderBy("k", "ts", "id").collect().toSeq
    assert(got == want)
  }

  test("no-op on an already-compact table: empty result, files untouched") {
    val t = "graft_test_cdelta_noop"
    Bucketing.writeBucketedSorted(fixture(100, Seq("a", "b"), 0L), t, "k",
      sortCols, buckets)
    val before = warehouseFiles(t)
    assert(Bucketing.compactDelta(spark, t, "k", sortCols, buckets).isEmpty)
    assert(warehouseFiles(t) == before)
  }

  test("q97 flow equals the same readout computed from the raw table") {
    import graft.queries.EventsBackbone
    import graft.Tables
    val got = EventsBackbone.compactDeltaLifecycle(spark, sf0001)
      .collect().toSeq
    val w = Window.partitionBy("event_type").orderBy("us", "event_id")
    val want = Tables.events(spark, sf0001)
      .filter(unix_micros(col("ts")) < EventsBackbone.lifecycleCutoffUs ||
        col("event_type") === "purchase")
      .select(col("event_type"), unix_micros(col("ts")).as("us"),
        col("event_id"))
      .withColumn("prev", lag("us", 1).over(w))
      .filter(col("prev").isNotNull)
      .select(col("event_type"), (col("us") - col("prev")).as("gap_us"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_gaps"), max("gap_us").as("max_gap_us"),
        round(sum("gap_us").cast("double") / count(lit(1)) / 1000000d, 6)
          .as("avg_gap_sec"))
      .orderBy("event_type").collect().toSeq
    assert(got == want)
  }

  test("sim_index_compact: probe answer invariant, buckets back to one file, probe still pruned") {
    import graft.queries.SimilarityQueries
    // the lifecycle itself requires pre ≡ post probe answers in-flow; here
    // we pin the two properties the flow can't see from its own result:
    // (a) table service restored the one-file-per-bucket contract, and
    // (b) the post-compact probe still bucket-prunes to its 2 lists
    val post = SimilarityQueries.indexCompact(spark, sf0001)
    val m = "SelectedBucketsCount: (\\d+) out of (\\d+)".r
      .findFirstMatchIn(post.queryExecution.executedPlan.toString)
    assert(m.isDefined, "post-compact probe lost bucket pruning")
    assert(m.get.group(1).toInt <= 2 && m.get.group(1).toInt < m.get.group(2).toInt)
    val t = SimilarityQueries.compactIvfTable(sf0001)
    val perBucket = warehouseFiles(t).keys
      .groupBy(n => Bucketing.bucketIdOf(n).get).map { case (b, fs) => b -> fs.size }
    assert(perBucket.nonEmpty && perBucket.values.forall(_ == 1),
      s"buckets still multi-file after compaction: $perBucket")
    // the answer equals the shared-index staged probe's (same centroids,
    // same probe lists, full corpus) — the oracle's equality, locally
    val viaShared = SimilarityQueries.ivfStagedTopK(spark, sf0001).collect().toSeq
    assert(post.collect().toSeq == viaShared)
  }
}
