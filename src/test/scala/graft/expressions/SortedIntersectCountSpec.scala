package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

import graft.SparkSpec

/** The sorted-merge intersect counts must be VALUE-EQUAL to
  * `size(array_intersect(...))` on sorted inputs — duplicates, empties, and
  * codegen/interpreted parity included — because the dedup verify and the
  * triangle closure swapped them in as drop-in replacements (r13).
  */
class SortedIntersectCountSpec extends SparkSpec {
  import spark.implicits._

  private def binCount(a: Column, b: Column): Column =
    ColumnBridge.column(SortedBinaryIntersectCount(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  private def longCount(a: Column, b: Column): Column =
    ColumnBridge.column(SortedLongIntersectCount(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  test("long: matches size(array_intersect) across overlap shapes, dups included") {
    val cases = Seq(
      (Seq(1L, 3L, 5L, 7L), Seq(3L, 5L, 9L)),
      (Seq.empty[Long], Seq(1L, 2L)),
      (Seq(1L, 2L, 3L), Seq.empty[Long]),
      (Seq(1L, 1L, 2L, 2L, 3L), Seq(1L, 2L, 2L, 4L)), // dup elements count once
      (Seq(-5L, -1L, 0L, 2L), Seq(-5L, 2L)),          // negatives in order
      (Seq(1L, 2L), Seq(3L, 4L)))                     // disjoint
    val df = cases.toDF("a", "b")
      .select(longCount(col("a"), col("b")).as("merge"),
        size(array_intersect(col("a"), col("b"))).cast("long").as("generic"))
    assert(df.filter(col("merge") =!= col("generic")).count() == 0)
  }

  test("binary: matches size(array_intersect) on sorted md5-like digests") {
    // digests via md5+unhex, sorted by array_sort — exactly the build path
    // of the staged shingle arrays
    val docs = Seq(
      (1L, Seq("a", "b", "c", "d")),
      (2L, Seq("c", "d", "e")),
      (3L, Seq.empty[String]),
      (4L, Seq("a", "a", "b"))) // dup digest in one side
    val arr = docs.toDF("id", "ws")
      .select(col("id"), array_sort(transform(col("ws"), w => unhex(md5(w)))).as("ms"))
    val pairs = arr.as("x").crossJoin(arr.select(col("id").as("id2"), col("ms").as("ms2")).as("y"))
      .filter(col("id") < col("id2"))
      .select(binCount(col("ms"), col("ms2")).as("merge"),
        size(array_intersect(col("ms"), col("ms2"))).cast("long").as("generic"))
    assert(pairs.count() == 6)
    assert(pairs.filter(col("merge") =!= col("generic")).count() == 0)
  }

  test("binary: unsigned comparison order (high-bit bytes sort after low)") {
    // 0x7f < 0x80 unsigned — a SIGNED byte compare would invert this pair
    val df = Seq((Seq(Array(0x7f.toByte), Array(0x80.toByte)),
      Seq(Array(0x80.toByte)))).toDF("a", "b")
    assert(df.select(binCount(col("a"), col("b"))).head.getLong(0) == 1L)
  }

  test("interpreted eval agrees with codegen") {
    val a = Seq(1L, 4L, 6L)
    val b = Seq(2L, 4L, 6L, 8L)
    val viaEval = SortedLongIntersectCount(
      ColumnBridge.expression(lit(null)), ColumnBridge.expression(lit(null)))
      .nullSafeEval(
        org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(a.toArray),
        org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(b.toArray))
    assert(viaEval == 2L)
    val viaPlan = Seq((a, b)).toDF("a", "b")
      .select(longCount(col("a"), col("b"))).head.getLong(0)
    assert(viaPlan == 2L)
  }

  test("null array element fails loudly with the contract message (r13 ADVICE)") {
    // array_intersect tolerates null elements; the sorted-merge contract
    // excludes them — a violation must name itself, not NPE in codegen
    // (binary) or silently read 0 (long)
    val binErr = intercept[Exception] {
      Seq((Seq("aa"), Seq("aa"))).toDF("x", "y")
        .select(binCount(
          array(unhex(col("x").getItem(0)), lit(null).cast("binary")),
          array(unhex(col("y").getItem(0)), lit(null).cast("binary"))))
        .collect()
    }
    assert(exceptionChain(binErr).exists(_.getMessage != null) &&
      exceptionChain(binErr).exists(m =>
        Option(m.getMessage).exists(_.contains("SortedIntersectCount: null array element"))))
    val longErr = intercept[Exception] {
      Seq(1).toDF("one")
        .select(longCount(
          array(lit(1L), lit(null).cast("long")),
          array(lit(null).cast("long"), lit(1L))))
        .collect()
    }
    assert(exceptionChain(longErr).exists(m =>
      Option(m.getMessage).exists(_.contains("SortedIntersectCount: null array element"))))
  }

  private def exceptionChain(t: Throwable): Seq[Throwable] =
    Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10).toSeq
}
