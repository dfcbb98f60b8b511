package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

import graft.expressions.{Bloom, BloomFilterAgg, BloomMightContain}

/** Semi-join reduction via a bloom filter — the sideways-information-passing
  * move for a selective-dim ⋈ huge-fact join at 100 TB: build a fixed-size
  * bloom over the dim side's join keys (one aggregation whose shuffle
  * carries OR-merged bitsets, never keys), then prefilter the fact side's
  * SCAN with a codegen'd `might_contain` probe BEFORE the join's exchange.
  * Fact rows whose key cannot match never enter the shuffle — for a dim that
  * keeps 5% of keys, ~95% of the 100 TB side's shuffle I/O disappears at the
  * cost of one bounded bitset broadcast.
  *
  * False positives (~1% at the sized capacity) only let a few extra rows
  * into the shuffle; the join's exact equi-condition still removes them, so
  * the RESULT is identical to the plain join — which is precisely what lets
  * the oracle be plain SQL (`q54_bloom_join`).
  *
  * The filter blob is collected to the driver and embedded as a literal —
  * bounded by construction (10 bits/key: ~1.2 MB for a million-key dim,
  * the broadcast-hash-join threshold regime; a dim too big for that is too
  * big for semi-join reduction to pay anyway). Same bounded-artifact pattern
  * as the IVF codebook collect.
  */
object BloomPrune {

  private def aggColumn(key: Column, numWords: Int): Column =
    ColumnBridge.column(
      BloomFilterAgg(ColumnBridge.expression(key), numWords).toAggregateExpression())

  /** Build a serialized bloom filter over `dim`'s `key` column, sized for
    * `expectedItems` (~1% FP at 10 bits/item, k=7).
    */
  def buildFilter(dim: DataFrame, key: String, expectedItems: Long): Array[Byte] =
    dim.agg(aggColumn(col(key), Bloom.wordsFor(expectedItems)).as("bf"))
      .head().getAs[Array[Byte]](0)

  /** Probe column: true iff `key` might be in `filter`. */
  def mightContain(filter: Array[Byte], key: Column): Column =
    ColumnBridge.column(BloomMightContain(
      ColumnBridge.expression(lit(filter)),
      ColumnBridge.expression(key)))

  /** Inner equi-join with the fact side pre-pruned by a bloom of the dim
    * keys. Result is identical to `fact.join(dim, keys)` — the filter can
    * only pass a superset of matching keys, and the join applies the exact
    * condition.
    *
    * `expectedItems` sizes the filter; pass the dim's (estimated) key count.
    * Non-BIGINT keys (strings, composites) route through [[keyed]] on both
    * sides, so any equi-join key works — the bloom sees the same xxhash64
    * image of the key wherever it is built or probed.
    */
  def bloomPrunedJoin(fact: DataFrame, dim: DataFrame, key: String,
                      expectedItems: Long): DataFrame = {
    val factType = fact.schema(key).dataType
    val dimType = dim.schema(key).dataType
    // Mixed key widths (e.g. fact INT vs dim BIGINT) would hash to DIFFERENT
    // xxhash64 images of the same logical value: the filter gets built on one
    // image, probed with the other, and bloom false NEGATIVES silently drop
    // matching rows — violating the result-identical-to-plain-join contract.
    // Spark would happily run the plain join via implicit casts, so this has
    // to fail loudly here rather than mis-prune.
    require(factType == dimType,
      s"bloomPrunedJoin: key '$key' is $factType on the fact side but " +
        s"$dimType on the dim side; cast both sides to a common type before " +
        "pruning — hashing mixed widths would drop matching rows")
    val isLong = factType == org.apache.spark.sql.types.LongType
    val keyed_ = if (isLong) col(key) else keyed(col(key))
    val bf = buildKeyedFilter(dim, keyed_, expectedItems)
    fact.filter(mightContain(bf, keyed_)).join(dim, Seq(key))
  }

  /** 64-bit key image for non-BIGINT join keys: the native `xxhash64`
    * (codegen'd, collision rate ~2⁻⁶⁴ — irrelevant next to the filter's own
    * 1% FP design point, and FPs only cost re-dropped rows anyway).
    */
  def keyed(key: Column): Column = xxhash64(key)

  private def buildKeyedFilter(dim: DataFrame, keyExpr: Column,
                               expectedItems: Long): Array[Byte] =
    dim.agg(aggColumn(keyExpr, Bloom.wordsFor(expectedItems)).as("bf"))
      .head().getAs[Array[Byte]](0)
}
