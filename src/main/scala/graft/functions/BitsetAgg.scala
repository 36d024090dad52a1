package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Distributed bit-set OR-aggregation: each input row is a bit POSITION
  * (a long in `[0, numBits)`; out-of-range and null inputs are
  * ignored), the result is the `numBits`-wide set membership packed as
  * `ARRAY<BIGINT>` (`numBits`/64 words, little-endian bit order —
  * word `p >>> 6`, bit `p & 63`).
  *
  * This is the build side of a Bloom filter whose hash functions live
  * in the CALLER's plan (portable md5 double-hashing, so an external
  * engine can replay membership exactly — Spark's own
  * `stat.bloomFilter` sketch hashes with Murmur3 internally and can't
  * be cross-checked). Each task folds its rows into a local buffer of
  * `numBits/8` bytes; partial buffers combine by word-wise OR — the
  * shuffle moves one fixed-size buffer per partition, never the
  * positions themselves.
  */
case class BitsetAgg(
    child: Expression,
    numBits: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  private val numWords = (numBits + 63) >>> 6

  override def prettyName: String = "bitset_agg"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = {
    if (numBits < 64 || (numBits & 63) != 0)
      TypeCheckResult.TypeCheckFailure(
        s"bitset_agg numBits must be a positive multiple of 64, got $numBits")
    else child.dataType match {
      case LongType | IntegerType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"bitset_agg expects an integral bit position, got ${other.sql}")
    }
  }

  override def createAggregationBuffer(): Array[Long] = new Array[Long](numWords)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val p = v match {
        case l: java.lang.Long => l.longValue()
        case i: java.lang.Integer => i.longValue()
      }
      if (p >= 0 && p < numBits)
        buf((p >>> 6).toInt) |= (1L << (p & 63))
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numWords) { buf(i) |= other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(numWords * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(numWords)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BitsetAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BitsetAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BitsetAgg =
    copy(child = newChild)
}

object BitsetAgg {
  def apply(c: Column, numBits: Int): Column =
    ColumnBridge.column(
      BitsetAgg(ColumnBridge.expression(c), numBits).toAggregateExpression())
}
