package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Contracts of the routed (two-level) assignment beyond the oracle rows:
  * nothing lost, routing errors are exactly the cross-group cases, and
  * the routed stage stays deterministic.
  */
class TwoLevelAssignSpec extends SparkSpec {

  private lazy val emb = Tables.embeddings(spark, sf0001)
  private lazy val cent = emb.filter(col("vec_id") < Similarity.ivfCentroids)
    .select(col("vec_id").as("cid"), col("embedding").as("ce"))
  private val g = Similarity.groupsFor(Similarity.ivfCentroids)

  test("every vector is assigned exactly once (no empty-group loss)") {
    val n = emb.count()
    val asn = Similarity.assignTwoLevel(emb, cent, g)
    assert(asn.count() == n)
    assert(asn.select("vec_id").distinct().count() == n)
  }

  test("disagreement with exact argmax happens ONLY across routing groups") {
    // when the exact-best centroid lives in the vector's routed group, the
    // level-2 argmax sees it and must pick it (global max is group max)
    val exact = emb.crossJoin(broadcast(cent))
      .select(col("vec_id"), col("cid"),
        graft.functions.VectorOps.cosine(col("embedding"), col("ce")).as("c"))
      .groupBy("vec_id")
      .agg(max_by(col("cid"), struct(col("c"), (-col("cid")).as("t"))).as("cid_exact"))
    val sup = cent.filter(col("cid") < g)
      .select(col("cid").as("gid"), col("ce").as("ge"))
    val memberG = cent.crossJoin(broadcast(sup))
      .select(col("cid"), col("gid"),
        graft.functions.VectorOps.cosine(col("ce"), col("ge")).as("c"))
      .groupBy("cid")
      .agg(max_by(col("gid"), struct(col("c"), (-col("gid")).as("t"))).as("cgid"))
    val routedG = emb.crossJoin(broadcast(sup))
      .select(col("vec_id"), col("gid"),
        graft.functions.VectorOps.cosine(col("embedding"), col("ge")).as("c"))
      .groupBy("vec_id")
      .agg(max_by(col("gid"), struct(col("c"), (-col("gid")).as("t"))).as("vgid"))
    val routed = Similarity.assignTwoLevel(emb, cent, g)
      .select(col("vec_id"), col("cid").as("cid_routed"))
    val sameGroupDisagree = exact
      .join(routed, "vec_id")
      .join(routedG, "vec_id")
      .join(memberG, col("cid_exact") === col("cid"))
      .filter(col("cgid") === col("vgid") &&
        col("cid_exact") =!= col("cid_routed"))
      .count()
    assert(sameGroupDisagree == 0,
      s"$sameGroupDisagree vectors disagreed within their own routing group")
  }

  test("routed assignment is deterministic across runs") {
    val a = Similarity.assignTwoLevel(emb, cent, g)
      .select("vec_id", "cid").collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val b = Similarity.assignTwoLevel(emb, cent, g)
      .select("vec_id", "cid").collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(a.sameElements(b))
  }
}
