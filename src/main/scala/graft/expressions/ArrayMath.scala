package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Codegen'd folds over float/double array pairs — the r14 answer to the
  * decade rehearsal's HOF wall (SCALE_r14 §2): `aggregate(zip_with(...))`
  * does not participate in whole-stage codegen, so the PQ encode's n·M·K
  * distance evaluations and the double-cosine assignment paths paid a
  * per-element lambda+boxing tax measured in tens of seconds at 200k
  * vectors. These kernels run the SAME left-to-right double fold (bit-
  * identical to the HOF forms and to DuckDB's `list_sum(list_transform)`)
  * as a primitive loop inside codegen.
  *
  * Element types may differ per side (float corpus slice vs double
  * residual codeword — exactly [[graft.operators.Similarity.pqEncode]]'s
  * shape); each element is widened to double before the arithmetic, like
  * the HOF's explicit CASTs. Null handling matches the HOF forms exactly
  * (r15, after these kernels were exposed to arbitrary SQL input as
  * `graft_dotd`/`graft_l2sq`): a null element or mismatched lengths yield
  * NULL — `zip_with` pads the shorter side with nulls and `acc + NULL`
  * poisons the fold — instead of silently reading 0.0 / folding the
  * common prefix. The element null checks are emitted only when the array
  * type says `containsNull` — but note (r16, ADVICE) that parquet-read
  * array columns, and `slice()` results over them, declare
  * `containsNull = true` regardless of the data, so the serving-kernel
  * paths over staged tables DO emit the per-element check; on the all-
  * non-null vector columns it never fires and branch prediction makes it
  * measurement-noise next to the fold arithmetic. The branch-free loop
  * applies only to columns whose type provably forbids null elements
  * (e.g. `array(...)` constructions of non-nullable inputs).
  */
object ArrayMath {
  private[expressions] def elemType(dt: DataType): Option[DataType] = dt match {
    case ArrayType(FloatType, _) => Some(FloatType)
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case _ => None
  }

  private[expressions] def getD(x: ArrayData, t: DataType, i: Int): Double =
    if (t == FloatType) x.getFloat(i).toDouble else x.getDouble(i)

  private[expressions] def getDJava(v: String, t: DataType, i: String): String =
    if (t == FloatType) s"(double) $v.getFloat($i)" else s"$v.getDouble($i)"
}

sealed trait ArrayPairFold extends BinaryExpression {
  override def dataType: DataType = DoubleType

  // NULL can surface from non-null inputs (mismatched lengths, null
  // elements), so the HOF-parity contract forces nullable regardless of
  // the children's nullability.
  override def nullable: Boolean = true

  protected def kernelName: String

  // resolved once per expression instance, not once per evaluated row (the
  // interpreted path runs these in hot loops; codegen resolves statically)
  @transient protected lazy val leftElem: DataType =
    ArrayMath.elemType(left.dataType).get
  @transient protected lazy val rightElem: DataType =
    ArrayMath.elemType(right.dataType).get
  @transient protected lazy val elemsNullable: Boolean =
    left.dataType.asInstanceOf[ArrayType].containsNull ||
      right.dataType.asInstanceOf[ArrayType].containsNull

  override def checkInputDataTypes(): TypeCheckResult =
    (ArrayMath.elemType(left.dataType), ArrayMath.elemType(right.dataType)) match {
      case (Some(_), Some(_)) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$kernelName needs ARRAY<FLOAT|DOUBLE> inputs, " +
          s"got ${left.dataType} / ${right.dataType}")
    }

  /** step(aElem, bElem) → contribution to the running double sum. */
  protected def step(a: Double, b: Double): Double
  protected def javaStep(a: String, b: String): String

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (elemsNullable && (x.isNullAt(i) || y.isNullAt(i))) return null
      s += step(ArrayMath.getD(x, leftElem, i), ArrayMath.getD(y, rightElem, i))
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      // emitted only for array types that can actually hold null elements;
      // trusted vector columns (containsNull = false) keep a branch-free loop
      val nullCheck = if (elemsNullable) {
        s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
      } else ""
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $nullCheck
         |    $s += ${javaStep(ArrayMath.getDJava(a, leftElem, i), ArrayMath.getDJava(b, rightElem, i))};
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $s; }
         |}
       """.stripMargin
    })
}

/** `Σ_i a[i]·b[i]` in ascending order — the codegen'd general-element twin
  * of [[FloatDotProduct]] (kept as-is: its float-only plans are pinned).
  */
case class ArrayDotProduct(left: Expression, right: Expression)
    extends ArrayPairFold {
  override protected def kernelName: String = "ArrayDotProduct"
  override protected def step(a: Double, b: Double): Double = a * b
  override protected def javaStep(a: String, b: String): String = s"$a * $b"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `Σ_i (a[i]−b[i])²` in ascending order — the PQ encode distance
  * ([[graft.operators.Similarity.pqEncode]]'s hot expression: n·M·K
  * evaluations per corpus encode).
  */
case class ArrayL2Sq(left: Expression, right: Expression)
    extends ArrayPairFold {
  override protected def kernelName: String = "ArrayL2Sq"
  override protected def step(a: Double, b: Double): Double = { val d = a - b; d * d }
  // the JIT common-subexpressions the duplicated element reads; the HOF
  // form it mirrors also evaluated (x-c) twice
  override protected def javaStep(a: String, b: String): String =
    s"(($a) - ($b)) * (($a) - ($b))"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
