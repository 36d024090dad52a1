package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitter sketch over a string column: at most `k`
  * (token, weight) counters per buffer. The classic guarantee — proven
  * mergeable (Agarwal et al., "Mergeable Summaries", PODS'12), so
  * Spark may combine partials in ANY order/shape — is that every item
  * with true frequency > n/(k+1) SURVIVES into the result, whatever
  * the merge tree. Which items beyond those survive, and the weights
  * (lower bounds), are merge-order-dependent: callers MUST treat the
  * output as a candidate set and exactly re-count it (the two-pass
  * shape in `TextFunctions.heavyHitters`) — never report the sketch
  * weights themselves.
  *
  * Result: `ARRAY<STRUCT<token STRING, w BIGINT>>` — surviving
  * candidates with their (merge-order-dependent, lower-bound) weights,
  * unordered. The weights exist so a PERSISTED sketch can keep
  * merging with later increments (`MisraGries.mergeSketches`) — for
  * answering queries they remain candidates only.
  *
  * Scale shape: each task folds its rows into a bounded map (k
  * entries); the shuffle moves one ≤k-entry buffer per partition —
  * the corpus-wide token key space is never shuffled.
  */
case class MisraGriesAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[UTF8String, Long]]
  with UnaryLike[Expression] {

  override def prettyName: String = "misra_gries"
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("token", StringType, nullable = false),
      StructField("w", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    if (k < 1)
      TypeCheckResult.TypeCheckFailure(s"misra_gries k must be >= 1, got $k")
    else child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"misra_gries expects STRING, got ${other.sql}")
    }

  override def createAggregationBuffer(): mutable.HashMap[UTF8String, Long] =
    mutable.HashMap.empty

  private def decay(buf: mutable.HashMap[UTF8String, Long], by: Long): Unit =
    MisraGries.decay(buf, by)

  override def update(buf: mutable.HashMap[UTF8String, Long],
      input: InternalRow): mutable.HashMap[UTF8String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String]
      buf.get(s) match {
        case Some(c) => buf(s) = c + 1
        case None if buf.size < k =>
          // copy: Spark may reuse the row's backing buffer
          buf(s.clone()) = 1L
        case None => decay(buf, 1L)
      }
    }
    buf
  }

  override def merge(buf: mutable.HashMap[UTF8String, Long],
      other: mutable.HashMap[UTF8String, Long])
      : mutable.HashMap[UTF8String, Long] =
    MisraGries.mergeInto(buf, other, k)

  override def eval(buf: mutable.HashMap[UTF8String, Long]): Any =
    new GenericArrayData(buf.iterator.map { case (key, c) =>
      InternalRow(key, c)
    }.toArray[Any])

  override def serialize(buf: mutable.HashMap[UTF8String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (key, c) =>
      val b = key.getBytes
      out.writeInt(b.length)
      out.write(b)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[UTF8String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[UTF8String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf(UTF8String.fromBytes(b)) = in.readLong()
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MisraGriesAgg =
    copy(child = newChild)
}

object MisraGriesAgg {
  def apply(c: Column, k: Int): Column =
    ColumnBridge.column(
      MisraGriesAgg(ColumnBridge.expression(c), k).toAggregateExpression())
}

/** The sketch algebra, shared by the aggregate's combiner and by
  * driver-side merges of PERSISTED sketches with fresh increments
  * (the incremental heavy-hitter state is one ≤k-entry sketch — two
  * of those merge in microseconds on the driver; distributing the
  * merge would be ceremony).
  */
object MisraGries {

  /** decrement-all by `by`, dropping counters that hit zero */
  def decay(buf: mutable.HashMap[UTF8String, Long], by: Long): Unit = {
    val dead = mutable.ArrayBuffer[UTF8String]()
    buf.foreach { case (key, c) =>
      if (c <= by) dead += key else buf(key) = c - by
    }
    dead.foreach(buf.remove)
  }

  /** MG merge: add counters, then subtract the (k+1)-th largest weight
    * so at most k survive — the n/(k+1) survival guarantee is
    * preserved under ANY merge tree (Agarwal et al., PODS'12).
    */
  def mergeInto(buf: mutable.HashMap[UTF8String, Long],
      other: mutable.HashMap[UTF8String, Long], k: Int)
      : mutable.HashMap[UTF8String, Long] = {
    other.foreach { case (key, c) =>
      buf(key) = buf.getOrElse(key, 0L) + c
    }
    if (buf.size > k) {
      val weights = buf.values.toArray
      java.util.Arrays.sort(weights)
      decay(buf, weights(weights.length - k - 1))
    }
    buf
  }

  /** string-keyed convenience for driver-side merges */
  def merge(a: Map[String, Long], b: Map[String, Long], k: Int)
      : Map[String, Long] = {
    val buf = mutable.HashMap.empty[UTF8String, Long]
    a.foreach { case (t, w) => buf(UTF8String.fromString(t)) = w }
    val ob = mutable.HashMap.empty[UTF8String, Long]
    b.foreach { case (t, w) => ob(UTF8String.fromString(t)) = w }
    mergeInto(buf, ob, k).iterator
      .map { case (t, w) => t.toString -> w }.toMap
  }
}
