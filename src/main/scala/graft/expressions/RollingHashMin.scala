package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types.{DataType, LongType, StringType}

/** Karp-Rabin rolling-hash document fingerprint: the MINIMUM 32-bit
  * polynomial hash over all `window`-char substrings —
  * `H(i) = (Σ_j c_{i+j}·B^{w-1-j}) mod 2^32`, computed with the O(len)
  * rolling update `H ← (H − c_out·B^{w-1})·B + c_in (mod 2^32)` rather than
  * rehashing every window. Docs shorter than the window fingerprint to 0.
  *
  * The min-of-rolling-hashes is the classic content-defined fingerprint
  * (the degenerate single-hash case of MOSS winnowing): shared long
  * substrings make near-identical docs likely to share their minimum, while
  * any single-char edit elsewhere leaves it untouched.
  *
  * mod 2^32 via masking keeps every intermediate in signed-64 range, so a
  * SQL oracle can reproduce the value with a per-window direct sum
  * (`Σ c_j·(B^{w-1-j} mod 2^32)` masked) — the two formulations agree
  * mod 2^32 exactly. Characters are UTF-16 units (= code points on the BMP),
  * matching SQL `ascii()` for the ASCII/BMP corpora this targets.
  */
case class RollingHashMin(child: Expression, window: Int, base: Long = 257L)
  extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"RollingHashMin needs STRING, got $other")
  }

  private val mask = 0xFFFFFFFFL

  /** B^(window-1) mod 2^32 — the out-rolling coefficient. */
  private val bPow: Long = {
    var p = 1L
    (1 until window).foreach(_ => p = (p * base) & mask)
    p
  }

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val len = s.length
    if (len < window) 0L
    else {
      var h = 0L
      var i = 0
      while (i < window) { h = (h * base + s.charAt(i)) & mask; i += 1 }
      var min = h
      while (i < len) {
        h = ((h - s.charAt(i - window) * bPow) * base + s.charAt(i)) & mask
        if (h < min) min = h
        i += 1
      }
      min
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val s = ctx.freshName("s"); val len = ctx.freshName("len")
      val h = ctx.freshName("h"); val min = ctx.freshName("min")
      val i = ctx.freshName("i")
      s"""
         |java.lang.String $s = $v.toString();
         |int $len = $s.length();
         |if ($len < $window) { ${ev.value} = 0L; } else {
         |  long $h = 0L; int $i = 0;
         |  for (; $i < $window; $i++) { $h = ($h * ${base}L + $s.charAt($i)) & ${mask}L; }
         |  long $min = $h;
         |  for (; $i < $len; $i++) {
         |    $h = (($h - $s.charAt($i - $window) * ${bPow}L) * ${base}L + $s.charAt($i)) & ${mask}L;
         |    if ($h < $min) $min = $h;
         |  }
         |  ${ev.value} = $min;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
