package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ArrayType, DataType}

/** Static-type assertion that an array column holds NO null elements — the
  * element-level analogue of Catalyst's `KnownNotNull` (r17, closing the
  * r16 ADVICE item at [[ArrayMath]]): parquet-read array columns, and
  * `slice()`/`zip_with()`/`collect_list()` results over them, declare
  * `containsNull = true` regardless of the data, so the [[ArrayPairFold]]
  * kernels emit a per-element null branch that never fires on the vector
  * columns (fixed-width non-null floats by the staged-embedding contract).
  * Wrapping a kernel operand in this expression re-declares the element
  * type as non-null — zero runtime work (codegen is a pass-through of the
  * child's code) — so the fold compiles to the branch-free loop.
  *
  * CONTRACT, not a check: like `KnownNotNull`, this asserts what the caller
  * knows. Applied to a column that does hold a null element, the kernel
  * would read an undefined slot instead of returning NULL — keep it on the
  * internal vector-math paths (the staged embedding schema), never on the
  * user-facing `graft_dotd`/`graft_l2sq` SQL surface, whose HOF-parity null
  * semantics are spec-pinned.
  */
case class KnownNonNullElems(child: Expression) extends UnaryExpression {

  override def dataType: DataType = child.dataType match {
    case ArrayType(et, _) => ArrayType(et, containsNull = false)
    case t => t
  }

  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"KnownNonNullElems needs an ARRAY input, got $t")
  }

  override def eval(input: InternalRow): Any = child.eval(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
