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

  test("PqNearestCodes + PqAdcScore equal the explode-join-aggregate PQ chain") {
    val cent = centPrefix(16)
    val cb = Similarity.pqCodebookResidual(emb, cent)
    val resid = Similarity.residuals(emb, cent)
    // the pre-r16 encode chain, inlined (pqEncode + the pack it fed)
    val sub = resid.select(col("vec_id"), explode(expr(
        "transform(sequence(0, 7), j -> struct(j AS j, slice(rv, j*8+1, 8) AS sv))")).as("e"))
      .select(col("vec_id"), col("e.j").as("j"), col("e.sv").as("sv"))
    val oldCodes = sub.join(broadcast(cb), "j")
      .select(col("vec_id"), col("j"), col("k"),
        org.apache.spark.sql.graftbridge.ColumnBridge.column(
          graft.expressions.ArrayL2Sq(
            org.apache.spark.sql.graftbridge.ColumnBridge.expression(col("sv")),
            org.apache.spark.sql.graftbridge.ColumnBridge.expression(col("cw"))))
          .as("dist"))
      .groupBy("vec_id", "j")
      .agg(max_by(col("k"),
        struct((-col("dist")).as("nd"), (-col("k")).as("tie"))).as("code"))
      .groupBy("vec_id")
      .agg(expr(
        "transform(array_sort(collect_list(struct(j AS j, code AS code))), e -> e.code)")
        .as("codes"))
    val (ks, cws) = Similarity.collectCodebook(cb)
    val knl = resid.select(col("vec_id"),
      Similarity.pqCodesCol(col("rv"), ks, cws).as("codes_k"))
    val j1 = oldCodes.join(knl, "vec_id")
    assert(j1.filter(not(col("codes") <=> col("codes_k"))).count() == 0)

    // ADC: the old posexplode-join-fold vs the kernel, same LUT values
    val qe = emb.filter(col("vec_id") === 0).select(col("embedding"))
      .head().getSeq[Float](0).toArray
    val lutDf = emb.filter(col("vec_id") === 0)
      .select(col("vec_id"), explode(expr(
        "transform(sequence(0, 7), j -> struct(j AS j, slice(embedding, j*8+1, 8) AS qv))")).as("e"))
      .select(col("e.j").as("j"), col("e.qv").as("qv"))
      .join(broadcast(cb), "j")
      .select(col("j").as("lj"), col("k").as("lk"),
        expr("aggregate(zip_with(qv, cw, (x, c) -> CAST(x AS DOUBLE)*CAST(c AS DOUBLE)), " +
          "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)").as("ip"))
    val oldAdc = knl.select(col("vec_id"), posexplode(col("codes_k")))
      .toDF("vec_id", "j", "code")
      .join(broadcast(lutDf), col("j") === col("lj") && col("code") === col("lk"))
      .groupBy("vec_id")
      .agg(expr("aggregate(array_sort(collect_list(struct(j AS j, ip AS ip))), " +
        "CAST(0.0 AS DOUBLE), (acc, e) -> acc + e.ip)").as("adc"))
    // driver-side LUT must equal the zip_with LUT bit-for-bit
    val ips = Similarity.lutFor(qe, cws)
    val lutGot = lutDf.collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getDouble(2)).toMap
    ks.zipWithIndex.foreach { case (krow, j) =>
      krow.zipWithIndex.foreach { case (kk, t) =>
        assert(lutGot((j, kk)) == ips(j)(t),
          s"LUT drift at j=$j k=$kk") } }
    val knlAdc = knl.select(col("vec_id"),
      Similarity.adcScoreCol(col("codes_k"), ks, ips).as("adc_k"))
    val j2 = oldAdc.join(knlAdc, "vec_id")
    assert(j2.filter(col("adc") =!= col("adc_k")).count() == 0)
  }

  test("nearestCidsFor equals the crossJoin + orderBy + limit probe selection") {
    val cent = centPrefix(16)
    val qe = emb.filter(col("vec_id") === 0).select(col("embedding"))
      .head().getSeq[Float](0).toArray
    val old = cent
      .select(col("cid"),
        VectorOps.cosine(col("ce"), typedlit(qe)).as("qcos"))
      .orderBy(desc("qcos"), asc("cid"))
      .limit(5).collect().map(_.getLong(0)).toSeq
    val (ids, vecs) = Similarity.collectCent(cent)
    assert(Similarity.nearestCidsFor(qe, ids, vecs, 5) == old)
    // qce must equal FloatDotProduct
    val qceOld = cent.select(col("cid"),
        VectorOps.dot(typedlit(qe), col("ce")).as("d"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(Similarity.qceFor(qe, ids, vecs) == qceOld)
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
