package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Nearest-centroid argmax over a BROADCAST centroid matrix — the
  * large-k face of `Similarity.assignCells`.
  *
  * The literal path (an `array(struct(lit…))` of k centroids folded by
  * `array_max`) is perfect for small k: fully codegen'd, and the
  * DuckDB oracle replays it from the same literals. But the literal
  * IS the plan — at k = 8192 × 128-d the centroid matrix serializes
  * into every consuming stage's task binary (the 2.3 MiB
  * "broadcasting large task binary" WARNs in KMeansIvfSpec), and at
  * coarse-quantizer sizes beyond that it becomes a plan-size wall.
  * This expression carries a `Broadcast` handle instead: tasks
  * serialize the few-byte reference, executors fetch the matrix once.
  *
  * Semantics are IDENTICAL to the literal path by construction, not
  * by re-derivation:
  *   - similarity = `round(cosine_sim(vec, centroid), 9)` — the same
  *     [[CosineSim.compute]] static the literal path codegens, and
  *     the same scala `BigDecimal(d).setScale(9, HALF_UP)` rounding
  *     Catalyst's `Round` applies to doubles;
  *   - tie rule = `array_max` over `struct(cs, cell)`: lexicographic
  *     max, so equal similarities resolve to the LARGEST cell id.
  * `CodegenFallback` is deliberate: the per-row cost is the k×dim
  * flop loop itself — interpretation overhead is noise next to it,
  * and the fallback keeps the broadcast handle out of codegen.
  */
case class NearestCell(child: Expression,
    centroids: Broadcast[Array[(Int, Array[Float])]])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "nearest_cell"

  private lazy val vecIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(
      s"nearest_cell expects ARRAY<FLOAT|DOUBLE>, got ${other.sql}")
  }

  // centroid rows wrapped once per executor into the ArrayData shape
  // CosineSim.compute consumes — identical arithmetic to the literal
  // path's codegen'd call, including element order
  @transient private lazy val cells: Array[(Int, GenericArrayData)] =
    centroids.value.map { case (cell, v) =>
      cell -> new GenericArrayData(v.map(x => x: Any))
    }

  override def nullSafeEval(v: Any): Any = {
    val vec = v.asInstanceOf[ArrayData]
    var bestCs = Double.NegativeInfinity
    var bestCell = Int.MinValue
    var first = true
    var i = 0
    while (i < cells.length) {
      val (cell, cv) = cells(i)
      val raw = CosineSim.compute(vec, cv, vecIsFloat, true)
      // Catalyst's Round passes NaN/Infinity through unrounded — match
      val cs =
        if (raw.isNaN || raw.isInfinite) raw
        else BigDecimal(raw)
          .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
      // Double.compare = Spark's total order over doubles (NaN
      // greatest, -0.0 < 0.0) — the same order array_max applies
      val cmp = java.lang.Double.compare(cs, bestCs)
      if (first || cmp > 0 || (cmp == 0 && cell > bestCell)) {
        bestCs = cs; bestCell = cell; first = false
      }
      i += 1
    }
    bestCell
  }

  override protected def withNewChildInternal(c: Expression): NearestCell =
    copy(child = c)
}

object NearestCell {
  def apply(vec: Column,
      centroids: Broadcast[Array[(Int, Array[Float])]]): Column =
    ColumnBridge.column(
      new NearestCell(ColumnBridge.expression(vec), centroids))
}
