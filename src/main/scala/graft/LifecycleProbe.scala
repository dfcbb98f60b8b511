package graft

import org.apache.spark.sql.functions._

import graft.operators.{Bucketing, Similarity}
import graft.queries.SimilarityQueries

/** Dev probe (r16 optimization round): per-phase wall times inside the
  * index-lifecycle rows, so optimization effort lands on the measured wall
  * instead of the assumed one. Mirrors `sim_ivfpq_delete`'s exact flow
  * (same tables, same artifacts) with a timer around each phase; `lsh` as
  * the first arg runs the `sim_lsh_delete` twin instead (r17, verdict
  * item 3: the LSH lifecycle was never phase-profiled).
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 tools/run_main.sh graft.LifecycleProbe [lsh]
  */
object LifecycleProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val s = GraftSession.local(defaultCpus = 32)
    s.sparkContext.setLogLevel("ERROR")

    def t[A](tag: String)(f: => A): A = {
      System.gc()
      val t0 = System.nanoTime()
      val r = f
      println(f"[phase] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

    if (args.headOption.contains("lsh")) { lshDelete(s, dir); s.stop(); return }

    (1 to 2).foreach { pass =>
      println(s"== pass $pass (${if (pass == 1) "cold" else "warm"}) ==")
      val tab = SimilarityQueries.pqDeleteTable(dir)
      val tomb = tab + "_tomb"
      val kc = SimilarityQueries.adaptiveKc(s, dir)
      val emb = Tables.embeddings(s, dir)
      val cent = emb.filter(col("vec_id") < kc)
        .select(col("vec_id").as("cid"), col("embedding").as("ce"))
      val cb = t("pq codebook (lazy build)")(
        Similarity.pqCodebookResidual(emb, cent, centroidsN = kc))
      t("stageIvfPqBucketed")(
        Similarity.stageIvfPqBucketed(emb, cent, cb, tab, buckets = kc, centroidsN = kc))
      t("drop tomb")(Bucketing.dropStaged(s, tomb))
      t("2x deleteStagedIvf")(SimilarityQueries.deleteResidues.foreach { r =>
        Similarity.deleteStagedIvf(emb.filter(col("vec_id") % 10 === r), cent,
          tomb, buckets = kc, centroidsN = kc)
      })
      val qe = t("query vec collect")(
        emb.filter(col("vec_id") === 0).select("embedding")
          .head().getSeq[Float](0).toArray)
      val probeCids = t("probe-cid selection")(
        emb.filter(col("vec_id") < kc)
          .select(col("vec_id").as("cid"),
            graft.functions.VectorOps.cosine(col("embedding"), typedlit(qe)).as("qcos"))
          .orderBy(desc("qcos"), asc("cid"))
          .limit(2).collect().map(_.getLong(0)).toSeq)
      t("pre probe (tombstoned)")(
        Similarity.probeStagedIvfPq(s, tab, emb, 0L, probeCids, k = 10,
          centroidsN = kc, tombTableOpt = Some(tomb)).collect())
      t("compactDeletes")(
        Bucketing.compactDeletes(s, tab, tomb, "vec_id", "cid", Seq("cid"),
          buckets = kc))
      t("drop tomb 2")(Bucketing.dropStaged(s, tomb))
      t("post probe")(
        Similarity.probeStagedIvfPq(s, tab, emb, 0L, probeCids, k = 10,
          centroidsN = kc).collect())
    }
    s.stop()
  }

  /** `sim_lsh_delete`'s exact flow with per-phase timers (r17). */
  private def lshDelete(s: org.apache.spark.sql.SparkSession, dir: String): Unit = {
    def t[A](tag: String)(f: => A): A = {
      System.gc()
      val t0 = System.nanoTime()
      val r = f
      println(f"[phase] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    (1 to 2).foreach { pass =>
      println(s"== pass $pass (${if (pass == 1) "cold" else "warm"}) ==")
      val planes = SimilarityQueries.stagedPlanesFor(s, dir)
      val tab = SimilarityQueries.lshDeleteTable(dir)
      val tomb = tab + "_tomb"
      val emb = Tables.embeddings(s, dir)
      t("stageLshBucketed")(
        Similarity.stageLshBucketed(emb, tab, planes,
          SimilarityQueries.stagedLshBuckets))
      t("drop tomb")(Bucketing.dropStaged(s, tomb))
      t("2x deleteStagedLsh")(SimilarityQueries.deleteResidues.foreach { r =>
        Similarity.deleteStagedLsh(emb.filter(col("vec_id") % 10 === r), tomb,
          planes, SimilarityQueries.stagedLshBuckets)
      })
      val q = t("query vec+code collect")(
        Similarity.withLshCode(emb.filter(col("vec_id") === 0), "embedding", planes)
          .select(col("embedding"), col("lsh_code")).head())
      val (qe, qcode) = (q.getSeq[Float](0).toArray, q.getLong(1))
      t("pre probe (tombstoned)")(
        Similarity.probeStagedLshDeletes(s, tab, tomb, qe, qcode, planes,
          k = 10).collect())
      t("compactDeletes")(
        Bucketing.compactDeletes(s, tab, tomb, "vec_id", "lsh_code",
          Seq("lsh_code"), SimilarityQueries.stagedLshBuckets))
      t("drop tomb 2")(Bucketing.dropStaged(s, tomb))
      t("post probe")(
        Similarity.probeStagedLsh(s, tab, qe, qcode, planes, k = 10).collect())
    }
  }
}
