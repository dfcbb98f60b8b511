package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Order statistics over BOUNDED window frames without the generic
  * percentile aggregate's per-row cost.
  *
  * Why this exists: Spark evaluates an aggregate inside a sliding ROWS
  * frame by REBUILDING the aggregation buffer for every output row.
  * For `percentile(x, q)` that buffer is a boxed open-hash counts map that
  * is allocated, filled, sorted, and interpolated once per row — the
  * dominant per-row constant in q88's rolling median (SCALE_r10: the
  * banded rewrite left q88 frame-evaluation-bound). For a frame bounded at
  * n rows the whole state fits a small array: `collect_list` append is the
  * cheapest per-row rebuild Spark offers, and one `sort_array` +
  * `element_at` selection in the PROJECT (codegen'd, no aggregate) does
  * the rest. Same asymptotics, ~an-order-of-magnitude smaller constant,
  * zero boxing churn beyond the list buffer itself.
  *
  * Exactness: [[medianOfSorted]] reproduces `percentile(x, 0.5)`'s
  * interpolation arithmetic BIT-FOR-BIT — Spark's aggregate returns the
  * middle element DIRECTLY when the position is integral (odd frame) and
  * otherwise the weight-form `(higher−pos)·lo + (pos−lower)·hi`, i.e.
  * `0.5·lo + 0.5·hi` at the median — NOT the algebraically-equal
  * `lo + (hi−lo)·0.5` or `(lo+hi)/2`, which round differently in the last
  * ulp (and differ on signed zeros). FrameQuantileSpec pins bit-parity on
  * real data and on tie/negative/subnormal fixtures.
  *
  * Scale shape: nothing here changes the plan — the frame aggregate stays
  * whatever window (flat or [[BandedWindow]]) the caller runs it in; this
  * only swaps WHICH aggregate walks the frame. Memory per row in flight is
  * O(n) for the frame list, bounded by construction.
  */
object FrameQuantile {

  /** The frame's values as a SORTED array column: evaluate
    * `sort_array(collect_list(value)) OVER w` with `w` a bounded frame.
    * Nulls are dropped by collect_list — the same null treatment
    * `percentile` and `count(value)` apply, so `size` of the result IS the
    * frame's non-null count (no second count aggregate needed).
    */
  def sortedFrame(value: Column): org.apache.spark.sql.expressions.WindowSpec => Column =
    w => sort_array(collect_list(value).over(w))

  /** Continuous (interpolated) median of an already-sorted array, with
    * `percentile(x, 0.5)`'s exact arithmetic; null on an empty array.
    *
    * Index derivation (1-based `element_at` over m elements): the
    * percentile position is p = 0.5·(m−1) (0-based); lower = ⌊p⌋ =
    * ⌊(m−1)/2⌋ → 1-based ⌊(m+1)/2⌋; higher = ⌈p⌉ = ⌊m/2⌋ → 1-based
    * ⌊m/2⌋+1. Odd m returns the middle element untouched (the aggregate's
    * integral-position branch); even m the 0.5·lo + 0.5·hi weight form.
    * The `when` guards short-circuit so the 0 index of the empty frame is
    * never evaluated (ANSI element_at would throw).
    */
  def medianOfSorted(arr: Column): Column = {
    val m = size(arr)
    val lo = element_at(arr, floor((m + lit(1)) / lit(2)).cast("int"))
    val hi = element_at(arr, (floor(m / lit(2)) + lit(1)).cast("int"))
    when(m % lit(2) === lit(1), lo)
      .when(m >= lit(2), lit(0.5) * lo + lit(0.5) * hi)
      .otherwise(lit(null))
  }
}
