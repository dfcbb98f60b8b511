package graft.expressions

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.functions.VectorOps
import graft.operators.Similarity

/** Parity pins for the r16 index kernels: each kernel must reproduce the
  * aggregation chain it replaced BIT-FOR-BIT — the staged tables and their
  * oracles were built on the old chains, so any drift (tie rule, zero-norm
  * guard, fold order, −0.0/NaN ordering) is a silent correctness change.
  */
class IndexKernelsSpec extends SparkSpec {

  private lazy val emb = Tables.embeddings(spark, sf0001)

  private def centPrefix(kc: Int) =
    emb.filter(col("vec_id") < kc)
      .select(col("vec_id").as("cid"), col("embedding").as("ce"))

  test("NearestCentroidId equals the crossJoin/max_by argmax on the real corpus") {
    val cent = centPrefix(16)
    val old = emb.crossJoin(broadcast(cent))
      .select(col("vec_id"), col("cid"),
        VectorOps.cosine(col("embedding"), col("ce")).as("ccos"))
      .groupBy("vec_id")
      .agg(max_by(col("cid"), struct(col("ccos"), (-col("cid")).as("tie"))).as("cid"))
    val (ids, vecs) = Similarity.collectCent(cent)
    val knl = emb.select(col("vec_id"),
      Similarity.nearestCidCol(col("embedding"), ids, vecs).as("cid_k"))
    val joined = old.join(knl, "vec_id")
    assert(joined.filter(col("cid") =!= col("cid_k")).count() == 0)
    assert(joined.count() == emb.count())
  }

  test("NearestCentroidId: exact ties resolve to the smaller cid, zero query vector to cid 0") {
    import spark.implicits._
    // two identical centroids -> every vector ties -> smaller cid wins;
    // a zero vector scores 0.0 against everything -> first cid wins
    val rows = Seq(
      (10L, Array(1.0f, 0.0f)),
      (11L, Array(0.0f, 0.0f))).toDF("vec_id", "embedding")
    val ids = Seq(3L, 7L)
    val vecs = Seq(Seq(1.0f, 0.0f), Seq(1.0f, 0.0f))
    val got = rows.select(col("vec_id"),
      Similarity.nearestCidCol(col("embedding"), ids, vecs).as("cid"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(10L) == 3L)
    assert(got(11L) == 3L)
  }

  test("floor residuals (kernel form) equal the join-shaped derivation") {
    val cent = centPrefix(16)
    // the pre-r16 join-shaped derivation, inlined
    val assigned = emb.crossJoin(broadcast(cent))
      .select(col("vec_id"), col("cid"),
        VectorOps.cosine(col("embedding"), col("ce")).as("ccos"))
      .groupBy("vec_id")
      .agg(max_by(col("cid"), struct(col("ccos"), (-col("cid")).as("tie"))).as("cid"))
    val old = emb.join(assigned, "vec_id").join(broadcast(cent), "cid")
      .select(col("vec_id"), col("cid"),
        expr("zip_with(embedding, ce, (x, c) -> CAST(x AS DOUBLE) - CAST(c AS DOUBLE))")
          .as("rv"))
    val neu = Similarity.residuals(emb, cent)
    assert(neu.select("vec_id", "cid", "rv").exceptAll(old).count() == 0)
    assert(old.exceptAll(neu.select("vec_id", "cid", "rv")).count() == 0)
  }
}
