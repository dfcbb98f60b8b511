package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout: interleave the bits of two sort keys
  * so that rows close in BOTH dimensions land close on the curve. Staged
  * storage sorted by the z-value gives every multi-dimensional range
  * predicate row-group-level pruning — the standard layout-clustering move
  * for 100 TB lakehouse tables, where a single-column sort can prune only
  * its own dimension.
  *
  * The z-value is a fold of built-in bitwise column ops (shift/and/or), so
  * it stays inside whole-stage codegen — no UDF, no custom expression
  * needed. The same fold is rendered as oracle SQL by [[zvalueSql]].
  */
object Layout {

  /** Bits taken from each dimension; 16+16 → a 32-bit curve position held
    * in a LONG. A val so query, oracle, and spec share the constant.
    */
  val zBits = 16

  /** Morton interleave of the low [[zBits]] bits of two non-negative LONG
    * keys: bit i of x lands at position 2i, bit i of y at 2i+1. The
    * per-bit terms occupy disjoint positions, so the fold is a pure
    * bitwise-OR reduction — associative, codegen-friendly, constant-folded
    * where a key is a literal.
    */
  def zvalue(x: Column, y: Column, bits: Int = zBits): Column =
    (0 until bits).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)

  /** The inverse: extract dimension `dim` (0 = x, 1 = y) back out of a
    * z-value. Used by the roundtrip spec; a reader never needs it (the
    * original columns stay stored alongside the curve position).
    */
  def unzvalue(z: Column, dim: Int, bits: Int = zBits): Column =
    (0 until bits).map { i =>
      shiftleft(shiftright(z, 2 * i + dim).bitwiseAND(lit(1L)), i)
    }.reduce(_ bitwiseOR _)

  /** The same interleave rendered as engine-portable SQL (DuckDB oracle). */
  def zvalueSql(x: String, y: String, bits: Int = zBits): String =
    (0 until bits).map { i =>
      s"((($x >> $i) & 1) << ${2 * i}) | ((($y >> $i) & 1) << ${2 * i + 1})"
    }.mkString("(", " | ", ")")

  /** Stage a frame z-ordered: range-partition on the curve position, sort
    * within partitions, so both file-level (range bounds) and row-group
    * (min/max stats) pruning see monotone z runs. `partitions` sizes the
    * output files — at cluster scale, pick bytes/partition, not a count.
    */
  def zorderBy(df: DataFrame, x: Column, y: Column, partitions: Int): DataFrame = {
    val z = zvalue(x, y)
    df.withColumn("zval", z)
      .repartitionByRange(partitions, col("zval"))
      .sortWithinPartitions("zval")
  }
}
