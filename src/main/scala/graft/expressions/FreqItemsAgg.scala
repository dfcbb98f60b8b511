package graft.expressions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy hitters as one mergeable Catalyst aggregate: at most
  * `capacity` counters of bounded size per aggregation buffer, whatever the
  * input cardinality — the frequent-items summary that works at 100 TB
  * because the shuffle carries a fixed-size sketch per group instead of the
  * full item-frequency table.
  *
  * Guarantees (Misra-Gries / Agarwal et al., "Mergeable Summaries"): every
  * surviving counter underestimates the true count by at most n/(capacity+1)
  * where n is the items seen, and any item with true count above that bound
  * is guaranteed to survive. When the input's distinct cardinality never
  * exceeds `capacity` the decrement path never fires and every count is
  * EXACT — the regime the oracle query pins (see `text_heavy`).
  *
  * Partial aggregation works like any built-in agg: `update` runs map-side,
  * `merge` combines two sketches by summing counters and then applying the
  * standard mergeable-summaries trim (subtract the (capacity+1)-th largest
  * count, drop non-positives), preserving the error bound.
  *
  * eval() emits `array<struct<token string, cnt long>>` sorted by
  * (cnt DESC, token ASC) so downstream consumption is deterministic.
  */
case class FreqItemsAgg(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  require(capacity > 0, s"capacity must be positive, got $capacity")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def prettyName: String = "freq_items_agg"
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("token", StringType, nullable = false),
      StructField("cnt", LongType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(buffer: mutable.HashMap[String, Long],
                      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      // copy out of the (possibly reused) UnsafeRow-backed UTF8String
      val token = v.asInstanceOf[UTF8String].toString
      buffer.get(token) match {
        case Some(c) => buffer.update(token, c + 1)
        case None if buffer.size < capacity => buffer.update(token, 1L)
        case None =>
          // Misra-Gries step: a full sketch + unseen item decrements all
          buffer.mapValuesInPlace((_, c) => c - 1)
          buffer.filterInPlace((_, c) => c > 0)
      }
    }
    buffer
  }

  override def merge(buffer: mutable.HashMap[String, Long],
                     other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    other.foreach { case (t, c) =>
      buffer.update(t, buffer.getOrElse(t, 0L) + c)
    }
    if (buffer.size > capacity) {
      // subtract the (capacity+1)-th largest count from everything
      val t = buffer.values.toArray.sorted(Ordering[Long].reverse).apply(capacity)
      buffer.mapValuesInPlace((_, c) => c - t)
      buffer.filterInPlace((_, c) => c > 0)
    }
    buffer
  }

  override def eval(buffer: mutable.HashMap[String, Long]): Any = {
    val sorted = buffer.toArray.sortBy { case (t, c) => (-c, t) }
    new GenericArrayData(sorted.map { case (t, c) =>
      new GenericInternalRow(Array[Any](UTF8String.fromString(t), c))
    })
  }

  override def serialize(buffer: mutable.HashMap[String, Long]): Array[Byte] = {
    val entries = buffer.toArray.map { case (t, c) =>
      (t.getBytes(StandardCharsets.UTF_8), c)
    }
    val bb = ByteBuffer.allocate(4 + entries.map(_._1.length + 12).sum)
    bb.putInt(entries.length)
    entries.foreach { case (b, c) =>
      bb.putInt(b.length); bb.put(b); bb.putLong(c)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val m = mutable.HashMap.empty[String, Long]
    (0 until n).foreach { _ =>
      val b = new Array[Byte](bb.getInt()); bb.get(b)
      m.update(new String(b, StandardCharsets.UTF_8), bb.getLong())
    }
    m
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqItemsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqItemsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): FreqItemsAgg =
    copy(child = newChildren(0))
}
