package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Count-Min sketch aggregate over pre-hashed item rows: a fixed
  * `depth × width` counter matrix where each input row increments one
  * cell per sketch row — cell `(r, (h1 + r·h2) mod width)` — and the
  * point-frequency estimate for an item is the MIN over its `depth`
  * cells (Cormode & Muthukrishnan, J. Algorithms '05). Estimates are
  * upper bounds: `est ≥ true` always; overshoot ≤ 2n/width with
  * probability ≥ 1 − 2⁻ᵈᵉᵖᵗʰ per query.
  *
  * The complement of [[MisraGriesAgg]]: MG keeps the top-k candidate
  * SET (but can answer nothing about items that fell out); CMS answers
  * a frequency query for ANY item from the same fixed-size state —
  * the "how common is this exact phrase / url / shingle corpus-wide"
  * primitive a curation pipeline asks after the fact.
  *
  * Hashing happens OUTSIDE the aggregate (callers pass the repo's
  * portable md5 double-hash halves, see [[graft.ext.Cms]]), so the
  * sketch is engine-replayable bit-for-bit: an external engine with
  * md5 reproduces every cell and every estimate, false positives
  * included. `depth ≤ 7` keeps `h1 + r·h2` inside a signed long (the
  * Bloom-filter bound, `Decontaminate.benchBloom`).
  *
  * Scale shape: each task folds its rows into one bounded
  * `depth·width`-long array (default 5×2048 = 80 KB); merge is
  * elementwise sum — exactly associative/commutative, so any Spark
  * merge tree (and any per-shard rollup of persisted sketches) yields
  * the identical matrix. The corpus-wide item key space is never
  * shuffled.
  */
case class CmsAgg(
    left: Expression,
    right: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with BinaryLike[Expression] {

  override def prettyName: String = "cms_sketch"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    if (depth < 1 || depth > 7)
      TypeCheckResult.TypeCheckFailure(
        s"cms_sketch depth must be in [1,7] (keeps h1 + r*h2 inside a " +
          s"long for 60-bit hashes), got $depth")
    else if (width < 1)
      TypeCheckResult.TypeCheckFailure(s"cms_sketch width must be >= 1")
    else (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"cms_sketch expects (BIGINT, BIGINT) hash halves, got " +
          s"(${l.sql}, ${r.sql})")
    }

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v1 = left.eval(input)
    val v2 = right.eval(input)
    if (v1 != null && v2 != null) {
      val h1 = v1.asInstanceOf[Long]
      val h2 = v2.asInstanceOf[Long]
      var r = 0
      while (r < depth) {
        buf(r * width + java.lang.Math.floorMod(h1 + r * h2, width.toLong)
          .toInt) += 1L
        r += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsAgg =
    copy(left = newLeft, right = newRight)
}

object CmsAgg {
  def apply(h1: Column, h2: Column, depth: Int, width: Int): Column =
    ColumnBridge.column(
      CmsAgg(ColumnBridge.expression(h1), ColumnBridge.expression(h2),
        depth, width).toAggregateExpression())
}
