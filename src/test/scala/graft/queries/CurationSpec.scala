package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CurationSpec extends SparkSpec {

  test("curated docs are a subset of the corpus and respect the quality floor") {
    val docs = graft.Tables.documents(spark, sf0001)
    val kept = CurationQueries.curatedDocs(spark, sf0001)
    assert(kept.count() > 0)
    assert(kept.count() <= docs.count())
    // keeper ids exist in the corpus
    assert(kept.join(docs, Seq("doc_id"), "left_anti").count() == 0)
  }

  test("pipeline_dump composes: its doc set is exactly curated ∩ train, spans tile each doc") {
    val dump = CurationQueries.pipelineDump(spark, sf0001).collect()
    val curated = CurationQueries.curatedDocs(spark, sf0001)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val train = graft.Tables.documents(spark, sf0001)
      .withColumn("split", graft.operators.Sampling.splitColumn(
        testPct = CurationQueries.splitTestPct, valPct = CurationQueries.splitValPct))
      .filter(col("split") === "train")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val dumpIds = dump.map(_.getLong(0)).toSet
    assert(dumpIds == (curated intersect train), "dump == curated ∩ train")
    // spans still tile every surviving doc (the packer ran on the filtered set)
    dump.groupBy(_.getLong(0)).foreach { case (_, ss) =>
      val ordered = ss.sortBy(_.getLong(2))
      assert(ordered.head.getLong(3) == 0L)
      assert(ordered.sliding(2).forall(p => p.size < 2 || p(0).getLong(4) == p(1).getLong(3)),
        "spans contiguous within doc")
    }
  }

  test("writeCorpus partitions by source with readable roundtrip") {
    val out = java.nio.file.Files.createTempDirectory("corpus").toString
    val kept = CurationQueries.curatedDocs(spark, sf0001)
    CurationQueries.writeCorpus(kept, out, maxRecordsPerFile = 100L)
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.nonEmpty && dirs.forall(_.startsWith("source=")))
    val back = spark.read.parquet(out)
    assert(back.count() == kept.count())
    // partition pruning works: one source reads a strict subset of files
    val one = back.filter(col("source") === back.select("source").head().getString(0))
    assert(one.count() > 0 && one.count() < back.count())
    // and it's PLAN-level pruning, not a post-scan filter: the source
    // predicate lands in the scan's PartitionFilters, so at 100 TB the
    // non-matching directories are never listed into tasks at all
    val scan = one.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PartitionFilters: [") && scan.contains("source"),
      s"source predicate missing from PartitionFilters:\n$scan")
  }
}
