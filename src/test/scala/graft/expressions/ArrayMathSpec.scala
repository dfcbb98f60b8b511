package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

import graft.SparkSpec

/** The r14 double-fold kernels must be BIT-EQUAL to the HOF formulations
  * they replaced ([[graft.operators.Similarity]]'s `doubleCosine` dot and
  * `pqEncode`'s l2sq) — same left-to-right order, same per-element widen to
  * double — across float/double element-type mixes and codegen/interpreted.
  */
class ArrayMathSpec extends SparkSpec {
  import spark.implicits._

  private def dotK(a: Column, b: Column): Column =
    ColumnBridge.column(ArrayDotProduct(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  private def l2K(a: Column, b: Column): Column =
    ColumnBridge.column(ArrayL2Sq(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  private def dotHof(a: String, b: String): Column = expr(
    s"aggregate(zip_with($a, $b, (p, q) -> CAST(p AS DOUBLE)*CAST(q AS DOUBLE)), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)")

  private def l2Hof(a: String, b: String): Column = expr(
    s"""aggregate(zip_with($a, $b,
        (x, c) -> (CAST(x AS DOUBLE)-CAST(c AS DOUBLE))*(CAST(x AS DOUBLE)-CAST(c AS DOUBLE))),
        CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)""")

  private val vals = Seq(
    (Seq(0.25, -1.5, 3.125, 0.1), Seq(2.0, 0.5, -0.75, 1.1)),
    (Seq(0.0, 0.0, 0.0, 0.0), Seq(1.0, 2.0, 3.0, 4.0)),
    (Seq(1e-9, 1e9, -1e-9, 7.0), Seq(1e9, 1e-9, 42.0, -7.0)))

  test("double×double: kernel == HOF fold bit-for-bit (dot and l2sq)") {
    val df = vals.toDF("a", "b")
      .select(dotK(col("a"), col("b")).as("dk"), dotHof("a", "b").as("dh"),
        l2K(col("a"), col("b")).as("lk"), l2Hof("a", "b").as("lh"))
    df.collect().foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
      assert(java.lang.Double.doubleToLongBits(r.getDouble(2)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(3)))
    }
  }

  test("float×double mix (the pqEncode residual shape): kernel == HOF") {
    val df = Seq((Seq(0.1f, -2.5f, 0.33f), Seq(1.5, 0.25, -0.125)))
      .toDF("f", "d")
      .select(l2K(col("f"), col("d")).as("lk"), l2Hof("f", "d").as("lh"),
        dotK(col("f"), col("d")).as("dk"), dotHof("f", "d").as("dh"))
    val r = df.collect().head
    assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
      java.lang.Double.doubleToLongBits(r.getDouble(1)))
    assert(java.lang.Double.doubleToLongBits(r.getDouble(2)) ==
      java.lang.Double.doubleToLongBits(r.getDouble(3)))
  }

  test("float×float agrees with the pinned FloatDotProduct kernel") {
    val df = Seq((Seq(0.5f, 1.25f, -3.0f), Seq(2.0f, -0.5f, 0.25f))).toDF("a", "b")
      .select(dotK(col("a"), col("b")).as("gen"),
        graft.functions.VectorOps.dot(col("a"), col("b")).as("flt"))
    val r = df.collect().head
    assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
      java.lang.Double.doubleToLongBits(r.getDouble(1)))
  }

  test("interpreted eval agrees with codegen") {
    import org.apache.spark.sql.catalyst.util.ArrayData
    val a = ArrayData.toArrayData(Array(0.25, -1.5, 3.125))
    val b = ArrayData.toArrayData(Array(2.0, 0.5, -0.75))
    val dt = org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.DoubleType, containsNull = false)
    val lits = (org.apache.spark.sql.catalyst.expressions.Literal(a, dt),
      org.apache.spark.sql.catalyst.expressions.Literal(b, dt))
    val viaEval = ArrayDotProduct(lits._1, lits._2).nullSafeEval(a, b)
    val viaPlan = Seq((Seq(0.25, -1.5, 3.125), Seq(2.0, 0.5, -0.75))).toDF("a", "b")
      .select(dotK(col("a"), col("b"))).head.getDouble(0)
    assert(viaEval == viaPlan)
    val l2Eval = ArrayL2Sq(lits._1, lits._2).nullSafeEval(a, b)
    val l2Plan = Seq((Seq(0.25, -1.5, 3.125), Seq(2.0, 0.5, -0.75))).toDF("a", "b")
      .select(l2K(col("a"), col("b"))).head.getDouble(0)
    assert(l2Eval == l2Plan)
  }

  test("null element or mismatched lengths -> NULL, like the HOF (r15)") {
    // zip_with pads the shorter side with nulls and acc + NULL poisons the
    // fold, so the HOF forms return NULL on both shapes; the kernels must too
    val df = Seq(
      (Seq[java.lang.Double](1.0, null, 3.0), Seq[java.lang.Double](1.0, 2.0, 3.0)),
      (Seq[java.lang.Double](1.0, 2.0), Seq[java.lang.Double](1.0, 2.0, 3.0)))
      .toDF("a", "b")
      .select(dotK(col("a"), col("b")).as("dk"), dotHof("a", "b").as("dh"),
        l2K(col("a"), col("b")).as("lk"), l2Hof("a", "b").as("lh"))
    df.collect().foreach { r =>
      assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2) && r.isNullAt(3))
    }
  }

  test("non-numeric array types rejected at analysis") {
    val e = intercept[Exception] {
      Seq((Seq("x"), Seq("y"))).toDF("a", "b")
        .select(dotK(col("a"), col("b"))).collect()
    }
    assert(e.getMessage.contains("ArrayDotProduct") ||
      Option(e.getCause).exists(_.getMessage.contains("ArrayDotProduct")))
  }
}
