package graft.expressions

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Shared bloom-filter kernel: a flat `long[]` bitset with
  * Kirsch-Mitzenmacher double hashing (`idx_i = h1 + i*h2 mod m`, the same
  * 2-hash family the MinHash signatures use) over a splitmix64-finalized
  * key. Both the aggregate that BUILDS a filter and the scalar expression
  * that PROBES one delegate here, so the two sides cannot drift.
  *
  * Serialized layout (little-endian): `[numHashes int][numWords int]
  * [words long...]` — the probe side reads its parameters out of the blob,
  * so a filter built with any (m, k) probes correctly without out-of-band
  * config.
  *
  * The `object` compiles to static forwarders, which is what lets
  * [[BloomMightContain]]'s generated Java call `Bloom.mightContain(...)`
  * directly inside whole-stage codegen.
  */
object Bloom {

  /** splitmix64 finalizer — avalanches sequential keys (TPC-H-style dense
    * surrogate ids) into uniform bits.
    */
  def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Bits for ~1% false positives at `expectedItems`, rounded up to whole
    * words (m ≈ 9.6·n for k=7 at 1%; we use 10·n).
    */
  def wordsFor(expectedItems: Long): Int = {
    val bits = math.max(64L, expectedItems * 10L)
    ((bits + 63L) / 64L).toInt
  }

  /** Standard k for the 10-bits-per-item sizing. */
  val defaultHashes = 7

  def set(words: Array[Long], numHashes: Int, key: Long): Unit = {
    val m = words.length.toLong * 64L
    val h1 = mix(key)
    val h2 = mix(key ^ 0x5851F42D4C957F2DL) | 1L
    var i = 0
    while (i < numHashes) {
      val bit = java.lang.Long.remainderUnsigned(h1 + i * h2, m)
      words((bit >>> 6).toInt) |= (1L << (bit & 63L))
      i += 1
    }
  }

  /** Probe a SERIALIZED filter. Called from generated code — keep the
    * signature Java-primitive.
    */
  def mightContain(blob: Array[Byte], key: Long): Boolean = {
    // graft_might_contain is SQL-exposed, so ANY binary value can reach this
    // point — validate the header before trusting it, or a truncated/garbage
    // blob surfaces as IndexOutOfBounds from generated code instead of a
    // diagnosable error.
    if (blob.length < 8)
      throw new IllegalArgumentException(
        s"malformed bloom filter: ${blob.length}-byte blob is shorter than the 8-byte header")
    val bb = ByteBuffer.wrap(blob).order(ByteOrder.LITTLE_ENDIAN)
    val numHashes = bb.getInt(0)
    val numWords = bb.getInt(4)
    // numHashes is bounded above as well as below: a crafted blob claiming
    // e.g. 2^31-1 hashes would otherwise pass and spin the probe loop for
    // billions of iterations per row. The builder emits 7; 64 is far beyond
    // any useful k for a 64-bit-word filter.
    if (numHashes <= 0 || numHashes > 64 || numWords <= 0 ||
        blob.length < 8 + 8L * numWords)
      throw new IllegalArgumentException(
        s"malformed bloom filter: header claims numHashes=$numHashes " +
          s"(must be in [1, 64]), numWords=$numWords, but the blob is " +
          s"${blob.length} bytes (needs ${8 + 8L * math.max(numWords, 0)})")
    val m = numWords.toLong * 64L
    val h1 = mix(key)
    val h2 = mix(key ^ 0x5851F42D4C957F2DL) | 1L
    var i = 0
    while (i < numHashes) {
      val bit = java.lang.Long.remainderUnsigned(h1 + i * h2, m)
      val word = bb.getLong(8 + 8 * (bit >>> 6).toInt)
      if ((word & (1L << (bit & 63L))) == 0L) return false
      i += 1
    }
    true
  }

  def serialize(words: Array[Long], numHashes: Int): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + 8 * words.length).order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(numHashes)
    bb.putInt(words.length)
    words.foreach(bb.putLong)
    bb.array()
  }

  def deserialize(blob: Array[Byte]): (Array[Long], Int) = {
    val bb = ByteBuffer.wrap(blob).order(ByteOrder.LITTLE_ENDIAN)
    val numHashes = bb.getInt()
    val numWords = bb.getInt()
    val words = new Array[Long](numWords)
    var i = 0
    while (i < numWords) { words(i) = bb.getLong(); i += 1 }
    (words, numHashes)
  }
}

/** Mergeable bloom-filter build aggregate over a BIGINT key column — the
  * semi-join-reduction summary: each map task inserts its keys into a local
  * bitset, partial buffers merge by bitwise OR (so the shuffle carries one
  * fixed-size filter per task, never the key set), and `eval` emits the
  * serialized blob. No false negatives ever; false positives ~1% at the
  * sized capacity — which only costs wasted probe rows, never correctness,
  * because the pruned join still applies the exact equi-condition.
  *
  * Null keys are skipped (an inner equi-join can never match them anyway).
  */
case class BloomFilterAgg(
    child: Expression,
    numWords: Int,
    numHashes: Int = Bloom.defaultHashes,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(numWords > 0, s"numWords must be positive, got $numWords")
  require(numHashes > 0, s"numHashes must be positive, got $numHashes")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def prettyName: String = "bloom_filter_agg"
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bloom_filter_agg needs a BIGINT key, got $t")
  }

  override def createAggregationBuffer(): Array[Long] = new Array[Long](numWords)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) Bloom.set(buffer, numHashes, v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buffer.length) { buffer(i) |= other(i); i += 1 }
    buffer
  }

  override def eval(buffer: Array[Long]): Any = Bloom.serialize(buffer, numHashes)

  override def serialize(buffer: Array[Long]): Array[Byte] =
    Bloom.serialize(buffer, numHashes)

  override def deserialize(bytes: Array[Byte]): Array[Long] =
    Bloom.deserialize(bytes)._1

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomFilterAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): BloomFilterAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** `might_contain(filter BINARY, key BIGINT) -> BOOLEAN` — the probe side of
  * [[BloomFilterAgg]], evaluated inside whole-stage codegen so the prefilter
  * runs at scan speed in the fact table's read stage. Standard null
  * propagation (null key → null), which `filter` treats as drop — exactly
  * inner-equi-join semantics, since a null key can never match.
  */
case class BloomMightContain(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
  override def prettyName: String = "graft_might_contain"

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (BinaryType, LongType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"graft_might_contain needs (BINARY, BIGINT), got ($l, $r)")
  }

  override def nullSafeEval(blob: Any, key: Any): Any =
    Bloom.mightContain(blob.asInstanceOf[Array[Byte]], key.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (blob, key) =>
      s"${ev.value} = graft.expressions.Bloom.mightContain($blob, $key);")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
