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

/** (max rounded cosine, argmax index) over a broadcast DOUBLE candidate
  * matrix — the k-means‖ trainer's large-sketch face of [[NearestCell]].
  * One struct result serves both trainer passes off a single k×dim
  * loop: `.getField("cs")` is the distance update (`1 − cs`),
  * `.getField("cell")` the weighting/Lloyd argmax.
  *
  * Semantics match the trainer's literal folds by construction: the
  * same [[CosineSim.compute]] double arithmetic, the same
  * Catalyst-`Round` rounding to 9 (NaN/Infinity pass through), the
  * same NaN-greatest total order, and on ties the LARGEST index — the
  * lexicographic `array_max` over (cs, cell) structs the literal path
  * applies. The reason to leave the literal regime at all is the task
  * binary: ~2.5k candidate vectors as `typedlit`s serialize a >1.5 MiB
  * expression tree into every consuming stage (the KMeansIvfSpec
  * "broadcasting large task binary" WARN at k=1024), where this
  * expression ships a few-byte broadcast handle. CodegenFallback for
  * the same reason as [[NearestCell]]: the k×dim flop loop dominates.
  */
case class NearestCandidate(child: Expression,
    cands: Broadcast[Array[Array[Double]]])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("cs", DoubleType), StructField("cell", IntegerType)))
  override def prettyName: String = "nearest_candidate"

  private lazy val vecIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(
      s"nearest_candidate expects ARRAY<FLOAT|DOUBLE>, got ${other.sql}")
  }

  @transient private lazy val cells: Array[GenericArrayData] =
    cands.value.map(v => new GenericArrayData(v.map(x => x: Any)))

  override def nullSafeEval(v: Any): Any = {
    val vec = v.asInstanceOf[ArrayData]
    var bestCs = Double.NegativeInfinity
    var bestCell = Int.MinValue
    var first = true
    var i = 0
    while (i < cells.length) {
      val raw = CosineSim.compute(vec, cells(i), vecIsFloat, false)
      val cs =
        if (raw.isNaN || raw.isInfinite) raw
        else BigDecimal(raw)
          .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
      val cmp = java.lang.Double.compare(cs, bestCs)
      if (first || cmp > 0 || (cmp == 0 && i > bestCell)) {
        bestCs = cs; bestCell = i; first = false
      }
      i += 1
    }
    org.apache.spark.sql.catalyst.InternalRow(bestCs, bestCell)
  }

  override protected def withNewChildInternal(c: Expression): NearestCandidate =
    copy(child = c)
}

object NearestCandidate {
  def apply(vec: Column,
      cands: Broadcast[Array[Array[Double]]]): Column =
    ColumnBridge.column(
      new NearestCandidate(ColumnBridge.expression(vec), cands))
}
