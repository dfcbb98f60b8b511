package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.ArrayType

import graft.SparkSpec

/** [[KnownNonNullElems]] is a zero-work static re-declaration: values pass
  * through untouched (codegen AND interpreted), a null ARRAY stays null, and
  * the declared element type drops `containsNull` — which is what lets the
  * [[ArrayPairFold]] kernels compile their branch-free loop on the staged
  * vector paths (r17, §4 kernel hygiene).
  */
class KnownNonNullElemsSpec extends SparkSpec {
  import spark.implicits._

  private def nn(c: Column): Column =
    ColumnBridge.column(KnownNonNullElems(ColumnBridge.expression(c)))

  test("declared type drops containsNull; values and null arrays pass through") {
    val df = Seq(Tuple1(Seq(0.25f, -1.5f, 3.0f)), Tuple1(null: Seq[Float]))
      .toDF("v")
    val out = df.select(nn(col("v")).as("w"))
    out.schema("w").dataType match {
      case ArrayType(_, cn) => assert(!cn, "containsNull must be false")
      case t => fail(s"unexpected type $t")
    }
    val rows = out.orderBy(col("w").isNull).collect()
    assert(rows(0).getSeq[Float](0) == Seq(0.25f, -1.5f, 3.0f))
    assert(rows(1).isNullAt(0))
  }

  test("kernel folds are bit-equal with and without the re-declaration") {
    val df = Seq((Seq(0.1f, -2.5f, 0.33f), Seq(1.5f, 0.25f, -0.125f))).toDF("a", "b")
    def l2(a: Column, b: Column) = ColumnBridge.column(ArrayL2Sq(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
    val r = df.select(
      l2(col("a"), col("b")).as("plain"),
      l2(nn(col("a")), nn(col("b"))).as("branchfree")).collect().head
    assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
      java.lang.Double.doubleToLongBits(r.getDouble(1)))
  }

  test("the wrapped fold's generated code has no per-element null branch") {
    // non-foldable, non-local input so the fold really codegens (a Seq.toDF
    // local relation is collapsed before codegen)
    val df = spark.range(2).select(
      array(col("id").cast("float"), (col("id") + 1).cast("float")).as("a"),
      array((col("id") + 2).cast("float"), (col("id") + 3).cast("float")).as("b"))
    // rebuild the array from nullable get() lookups — containsNull=true,
    // the parquet-read / slice() shape the staged probe paths see (a bare
    // nullability-widening cast is simplified away by SimplifyCasts)
    def nullable(c: Column) = array(get(c, lit(0)), get(c, lit(1)))
    def l2(a: Column, b: Column) = ColumnBridge.column(ArrayL2Sq(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
    def gen(c: Column): String = {
      val plan = df.select(c.as("x")).queryExecution.executedPlan
      org.apache.spark.sql.execution.debug.codegenString(plan)
    }
    // the PER-ELEMENT check indexes with the fold's loop VARIABLE —
    // `isNullAt(<ident>)` — where top-level row access uses literal
    // ordinals (`isNullAt(0)`); only the former must disappear
    val perElem = """isNullAt\([A-Za-z_]""".r
    val plain = gen(l2(nullable(col("a")), nullable(col("b"))))
    val wrapped = gen(l2(nn(nullable(col("a"))), nn(nullable(col("b")))))
    assert(perElem.findFirstIn(plain).isDefined,
      "baseline should carry the per-element branch (containsNull=true)")
    assert(perElem.findFirstIn(wrapped).isEmpty,
      "re-declared operands must compile the branch-free loop")
  }
}
