package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** The batch IVF probe must be a pure batching of the single-query probe:
  * for every query in the batch, its rows equal the single-query
  * [[Similarity.probeStagedIvf]] over the SAME probe lists with self
  * excluded — the per-pair membership recheck (a candidate counts for a
  * query only if its list is in THAT query's probe set) is exactly what
  * makes the union-pruned scan answer-identical to per-query pruned scans.
  */
class BatchIvfProbeSpec extends SparkSpec {

  test("batch probe ≡ per-query single probes (self-excluded)") {
    val emb = Tables.embeddings(spark, sf0001)
    val cent = emb.filter(col("vec_id") < Similarity.ivfCentroids)
      .select(col("vec_id").as("cid"), col("embedding").as("ce"))
    val t = "graft_spec_batchivf"
    Similarity.stageIvfBucketed(emb, cent, t, buckets = 8)
    val queries = emb.filter(col("vec_id") < 3)
      .select("vec_id", "embedding").collect()
      .map { r =>
        val qv = r.getSeq[Float](1).toArray
        val cids = cent
          .select(col("cid"),
            graft.functions.VectorOps.cosine(col("ce"), typedlit(qv)).as("c"))
          .orderBy(desc("c"), asc("cid")).limit(2)
          .collect().map(_.getLong(0)).toSeq
        (r.getLong(0), qv, cids)
      }.toSeq
    val batch = Similarity.probeStagedIvfBatch(spark, t, queries, k = 5)
      .collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.sortBy(_.getInt(3))
        .map(r => (r.getLong(1), r.getDouble(2))).toSeq).toMap
    queries.foreach { case (qid, qv, cids) =>
      val single = Similarity.probeStagedIvf(spark, t, qv, cids, k = 6)
        .collect().map(r => (r.getLong(0), r.getDouble(1)))
        .filterNot(_._1 == qid).take(5).toSeq
      assert(batch(qid) == single,
        s"query $qid: batch ${batch(qid)} != single $single")
    }
  }
}
