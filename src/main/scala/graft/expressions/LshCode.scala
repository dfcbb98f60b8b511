package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Signed-random-hyperplane LSH code of an `ARRAY<FLOAT>` vector: bit p is
  * set iff `dot(v, plane_{p+planeOffset}) > 0`, with plane components from
  * the fixed LCG `((1103515245*(p*dims+d)+12345) mod 2001 - 1000)/1000` —
  * the same formula the DuckDB oracle evaluates in SQL
  * (`Similarity.lshCodeSql`), with the same ascending-d Double accumulation,
  * so codes are bit-identical.
  *
  * `planeOffset` selects an independent plane family (offset `t·planes` for
  * table t) — the seed of multi-TABLE LSH amplification; 0 (the default)
  * reproduces the original single-table codes exactly.
  *
  * One codegen'd pass over the vector per plane replaces 8 interpreted
  * higher-order-function dot products per row.
  */
case class LshCode(child: Expression, planes: Int, dims: Int,
                   planeOffset: Int = 0) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"LshCode needs ARRAY<FLOAT>, got $other")
  }

  @inline private def planeComponent(p: Int, d: Int): Double =
    ((1103515245L * (p * dims + d) + 12345L) % 2001L - 1000L) / 1000.0

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = math.min(v.numElements(), dims)
    var code = 0L
    var p = 0
    while (p < planes) {
      var s = 0.0
      var d = 0
      while (d < n) {
        s += v.getFloat(d).toDouble * planeComponent(p + planeOffset, d)
        d += 1
      }
      if (s > 0) code |= (1L << p)
      p += 1
    }
    code
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n"); val p = ctx.freshName("p")
      val d = ctx.freshName("d"); val s = ctx.freshName("s")
      val code = ctx.freshName("code")
      s"""
         |int $n = java.lang.Math.min($v.numElements(), $dims);
         |long $code = 0L;
         |for (int $p = 0; $p < $planes; $p++) {
         |  double $s = 0.0;
         |  for (int $d = 0; $d < $n; $d++) {
         |    double plane = ((1103515245L * (($p + $planeOffset) * $dims + $d) + 12345L) % 2001L - 1000L) / 1000.0;
         |    $s += (double) $v.getFloat($d) * plane;
         |  }
         |  if ($s > 0) $code |= (1L << $p);
         |}
         |${ev.value} = $code;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
