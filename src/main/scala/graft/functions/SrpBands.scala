package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Banded sign-random-projection (SRP / hyperplane LSH) sketch over a
  * numeric embedding array: returns `bands` cell ids, each packing
  * `bits` sign bits of dot products against deterministic Rademacher
  * (±1) hyperplanes derived from a splitmix64 mix of (seed, plane,
  * dim). Two vectors at angle θ agree on one hyperplane w.p. 1 − θ/π,
  * so a pair shares at least one band cell w.p.
  * `1 − (1 − (1−θ/π)^bits)^bands` — the blocking key that lets
  * [[graft.ext.Similarity.cosinePairs]] auto-block an oversized corpus
  * instead of falling back to an all-pairs join. Fully deterministic
  * (no runtime randomness); codegen'd so the d×bits×bands multiply-add
  * loop stays inside whole-stage compiled plans.
  */
case class SrpBands(child: Expression, bits: Int, bands: Int, seed: Long)
    extends UnaryExpression {

  require(bits >= 1 && bits <= 63, "bits must be in [1, 63]")
  require(bands >= 1, "bands must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "srp_bands"

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"srp_bands expects ARRAY<FLOAT|DOUBLE>, got ${other.sql}")
    }

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(SrpBands.compute(
      input.asInstanceOf[ArrayData], isFloat, bits, bands, seed))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.SrpBands.compute($c, $isFloat, $bits, $bands, ${seed}L))")

  override protected def withNewChildInternal(newChild: Expression): SrpBands =
    copy(child = newChild)
}

object SrpBands {

  /** splitmix64 finalizer — full-avalanche mix of the plane/dim key */
  private def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  def compute(a: ArrayData, aFloat: Boolean, bits: Int, bands: Int,
      seed: Long): Array[Long] = {
    val d = a.numElements()
    val out = new Array[Long](bands)
    var band = 0
    var plane = 0
    while (band < bands) {
      var cell = 0L
      var b = 0
      while (b < bits) {
        var dot = 0.0
        var i = 0
        // plane key: plane * 2^40-ish prime + i is injective for d < 1e12
        val planeKey = seed + plane.toLong * 0x100000001B3L
        while (i < d) {
          val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
          dot += (if (mix(planeKey + i) < 0) -x else x)
          i += 1
        }
        cell = (cell << 1) | (if (dot >= 0) 1L else 0L)
        b += 1
        plane += 1
      }
      out(band) = cell
      band += 1
    }
    out
  }

  def apply(c: Column, bits: Int, bands: Int, seed: Long): Column =
    ColumnBridge.column(SrpBands(ColumnBridge.expression(c), bits, bands, seed))
}
