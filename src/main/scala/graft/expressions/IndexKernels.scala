package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Codegen'd kernels over BOUNDED index artifacts (r16 optimization round,
  * guide §2.4 + §4): the IVF/PQ serving family's assignment, encode and ADC
  * steps were planned as crossJoin(broadcast(artifact)) → groupBy-argmax
  * chains — correct, but each one costs an Exchange + HashAggregate (and an
  * AQE stage boundary) whose only job is to fold a per-row loop over a
  * model artifact that is SMALL BY CONSTRUCTION (centroid prefix ≤ kc rows,
  * residual codebook M·K rows, query LUT M·K rows). These kernels run the
  * identical fold as a primitive loop over a driver-collected copy of the
  * artifact, turning every assignment/encode/score step into a map-only
  * projection: staging a corpus becomes scan → project → bucketed write
  * with ZERO mid-plan exchanges at any corpus size, and a probe becomes
  * scan → project → TakeOrdered.
  *
  * Determinism parity (spec-pinned in `IndexKernelsSpec`): each kernel
  * reproduces the aggregation form it replaces bit-for-bit —
  *
  *  - comparisons use `java.lang.Double.compare` (NaN greatest, −0.0 <
  *    0.0), with candidates iterated in ascending id order so ties resolve
  *    to the smaller id exactly like the `(key, -id)` structs. One pedantic
  *    divergence from Spark's `max_by` ordering (r17, ADVICE):
  *    `nanSafeCompareDoubles` treats −0.0 == 0.0 where `Double.compare`
  *    distinguishes them — unreachable here, because the 0.0-seeded
  *    left-to-right folds can never produce −0.0 as a score;
  *  - every dot / norm / squared-L2 fold is the left-to-right double fold
  *    of [[FloatDotProduct]] / [[ArrayL2Sq]] (and of the DuckDB oracles'
  *    `list_sum(list_transform(...))`);
  *  - the zero-norm guard mirrors `VectorOps.cosine`'s `when(norm === 0,
  *    0.0)` arms.
  *
  * Contracts: vectors are fixed-width non-null float arrays (the staged
  * embedding schema); a null input row yields null output (nullSafeEval),
  * same as the expression chains these replace.
  */
object IndexKernels {
  private[expressions] def dotFF(a: ArrayData, b: Array[Float]): Double = {
    val n = math.min(a.numElements(), b.length)
    var s = 0.0; var i = 0
    while (i < n) { s += a.getFloat(i).toDouble * b(i).toDouble; i += 1 }
    s
  }
}

/** `cid` of the nearest centroid by cosine, ties to the smaller cid — the
  * map-only replacement for
  * `crossJoin(broadcast(cent)) → groupBy(id) → max_by(cid, struct(ccos,
  * -cid))`. `centIds` MUST be ascending (the builder in
  * `Similarity.collectCent` sorts); `centVecs(i)` pairs with `centIds(i)`.
  */
case class NearestCentroidId(child: Expression, centIds: Seq[Long],
                             centVecs: Seq[Seq[Float]])
    extends UnaryExpression {

  // an empty artifact would make nearest() read ids(0) of an empty array —
  // fail at construction with the contract instead (r17, ADVICE; the
  // replaced crossJoin plan yielded an empty frame, which no caller here
  // ever relied on — every staged corpus has a non-empty centroid prefix)
  require(centIds.nonEmpty, "NearestCentroidId needs a non-empty centroid artifact")

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"NearestCentroidId needs an ARRAY<FLOAT> input, got $t")
  }

  @transient private lazy val ids: Array[Long] = centIds.toArray
  @transient private lazy val vecs: Array[Array[Float]] =
    centVecs.map(_.toArray).toArray
  // centroid L2 norms, precomputed once with the FloatDotProduct fold
  @transient private lazy val norms: Array[Double] = vecs.map { v =>
    var s = 0.0; var i = 0
    while (i < v.length) { s += v(i).toDouble * v(i).toDouble; i += 1 }
    math.sqrt(s)
  }

  def nearest(a: ArrayData): Long = {
    var na = 0.0
    val n = a.numElements()
    var i = 0
    while (i < n) { val x = a.getFloat(i).toDouble; na += x * x; i += 1 }
    val sa = math.sqrt(na)
    var best = 0
    var bestCos = Double.NegativeInfinity
    var c = 0
    while (c < vecs.length) {
      val cos =
        if (sa == 0.0 || norms(c) == 0.0) 0.0
        else IndexKernels.dotFF(a, vecs(c)) / (sa * norms(c))
      if (java.lang.Double.compare(cos, bestCos) > 0) { best = c; bestCos = cos }
      c += 1
    }
    ids(best)
  }

  override def nullSafeEval(a: Any): Any = nearest(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nearestCentroid", this,
      classOf[NearestCentroidId].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.nearest($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Per-subspace nearest-codeword ids over a residual vector — the map-only
  * replacement for the PQ encode chain
  * `explode(subspaces) → join(broadcast(codebook)) → l2sq →
  * groupBy(id, j) max_by(k, struct(-dist, -k)) → groupBy(id)
  * collect_list-sorted pack`. Output is the packed `codes` array in
  * ascending subspace order, each entry the codeword id `k` with the
  * smallest squared L2 (ties to the smaller k; `ks(j)` ascending).
  */
case class PqNearestCodes(child: Expression, ks: Seq[Seq[Long]],
                          cws: Seq[Seq[Seq[Double]]], subDim: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) | ArrayType(FloatType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"PqNearestCodes needs an ARRAY<FLOAT|DOUBLE> input, got $t")
  }

  // float children are widened per element before the arithmetic, exactly
  // like ArrayL2Sq's mixed-type fold
  @transient private lazy val childIsFloat: Boolean =
    child.dataType == ArrayType(FloatType, containsNull = false) ||
      child.dataType.asInstanceOf[ArrayType].elementType == FloatType
  @transient private lazy val kArr: Array[Array[Long]] = ks.map(_.toArray).toArray
  @transient private lazy val cwArr: Array[Array[Array[Double]]] =
    cws.map(_.map(_.toArray).toArray).toArray

  def encode(rv: ArrayData): ArrayData = {
    val m = kArr.length
    val out = new Array[Long](m)
    var j = 0
    while (j < m) {
      val base = j * subDim
      val cands = cwArr(j)
      var best = 0
      var bestDist = Double.PositiveInfinity
      var t = 0
      while (t < cands.length) {
        val cw = cands(t)
        // ArrayL2Sq's left-to-right fold over the j-th slice
        var s = 0.0; var i = 0
        while (i < subDim) {
          val x = if (childIsFloat) rv.getFloat(base + i).toDouble
                  else rv.getDouble(base + i)
          val d = x - cw(i)
          s += d * d
          i += 1
        }
        if (java.lang.Double.compare(s, bestDist) < 0) { best = t; bestDist = s }
        t += 1
      }
      out(j) = kArr(j)(best)
      j += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(a: Any): Any = encode(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqNearestCodes", this,
      classOf[PqNearestCodes].getName)
    nullSafeCodeGen(ctx, ev,
      a => s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.encode($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Σ_j lut(j)(code_j) in ascending-j order — the map-only replacement for
  * the ADC chain `posexplode(codes) → join(broadcast(lut)) →
  * groupBy collect_list-sorted left fold`. `ks(j)` ascending; a (j, code)
  * pair absent from the LUT contributes nothing, like the inner join it
  * replaces — with one divergence (r17, ADVICE): a row with NO matching
  * pair at all scores 0.0 here where the inner join dropped it from the
  * ranking entirely. Unreachable while codes and LUT derive from the same
  * pinned codebook (every staged path here), but the parity is per-pair,
  * not per-row.
  */
case class PqAdcScore(child: Expression, ks: Seq[Seq[Long]],
                      ips: Seq[Seq[Double]])
    extends UnaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"PqAdcScore needs an ARRAY<BIGINT> codes input, got $t")
  }

  @transient private lazy val kArr: Array[Array[Long]] = ks.map(_.toArray).toArray
  @transient private lazy val ipArr: Array[Array[Double]] = ips.map(_.toArray).toArray

  def score(codes: ArrayData): Double = {
    val m = math.min(codes.numElements(), kArr.length)
    var s = 0.0
    var j = 0
    while (j < m) {
      val idx = java.util.Arrays.binarySearch(kArr(j), codes.getLong(j))
      if (idx >= 0) s += ipArr(j)(idx)
      j += 1
    }
    s
  }

  override def nullSafeEval(a: Any): Any = score(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqAdcScore", this, classOf[PqAdcScore].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.score($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
