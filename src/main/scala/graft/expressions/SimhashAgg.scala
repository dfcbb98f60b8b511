package graft.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, LongType}

/** SimHash vote aggregation fused into one Catalyst aggregate: per input row
  * (two 32-bit hash halves as longs) each of the 64 fingerprint bits votes
  * ±1; the final value sets bit b where the summed vote is positive.
  *
  * Replaces 64 separate `sum(CASE WHEN ...)` aggregate expressions with a
  * single buffer of 64 ints — same result bit-for-bit (see the differential
  * spec), but one aggregate update per row instead of 64 generated
  * projections, and a plan that stays small enough to compile fast. Still a
  * [[TypedImperativeAggregate]], so partial aggregation (map-side combine)
  * works exactly like the sum() formulation — the shuffle carries one
  * 64-int buffer per group.
  *
  * Vote counts are Int: a single document would need 2^31 tokens to
  * overflow, which is beyond any realistic row (and the groupBy key is a
  * single doc).
  */
case class SimhashAgg(
    lo: Expression,
    hi: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Int]] {

  override def children: Seq[Expression] = Seq(lo, hi)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_agg"

  override def createAggregationBuffer(): Array[Int] = new Array[Int](64)

  override def update(buffer: Array[Int], input: InternalRow): Array[Int] = {
    val l = lo.eval(input)
    val h = hi.eval(input)
    if (l != null && h != null) {
      val lv = l.asInstanceOf[Long]
      val hv = h.asInstanceOf[Long]
      var b = 0
      while (b < 32) {
        buffer(b) += (((lv >> b) & 1L) * 2 - 1).toInt
        buffer(b + 32) += (((hv >> b) & 1L) * 2 - 1).toInt
        b += 1
      }
    }
    buffer
  }

  override def merge(buffer: Array[Int], other: Array[Int]): Array[Int] = {
    var b = 0
    while (b < 64) { buffer(b) += other(b); b += 1 }
    buffer
  }

  override def eval(buffer: Array[Int]): Any = {
    var fp = 0L
    var b = 0
    while (b < 64) {
      if (buffer(b) > 0) fp |= (1L << b)
      b += 1
    }
    fp
  }

  override def serialize(buffer: Array[Int]): Array[Byte] = {
    val bb = ByteBuffer.allocate(64 * 4)
    buffer.foreach(bb.putInt)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(64)(bb.getInt())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SimhashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SimhashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): SimhashAgg =
    copy(lo = newChildren(0), hi = newChildren(1))
}
