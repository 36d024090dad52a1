package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** xxhash64 of every word n-gram of a token array, in one tight JVM
  * pass — value-identical to
  * `transform(shingles, s -> xxhash64(s))` over
  * `TextFunctions.shingles` (same joined bytes, same seed-42 hash),
  * but without materializing a string per shingle through the
  * slice/concat_ws/transform codegen pipeline (~2× on the shingling
  * stage of the dedup family). Codegen keeps it inside whole-stage
  * compiled plans.
  */
case class ShingleHashes(child: Expression, n: Int)
    extends UnaryExpression {

  require(n >= 1, "shingle size must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"shingle_hashes expects ARRAY<STRING>, got ${other.sql}")
    }

  override def nullSafeEval(input: Any): Any =
    ShingleHashes.compute(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.ShingleHashes.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

object ShingleHashes {

  private val Space = UTF8String.fromString(" ")

  def compute(tokens: ArrayData, n: Int): ArrayData = {
    val m = tokens.numElements()
    if (m < n) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](m - n + 1)
    val window = new Array[UTF8String](n)
    var i = 0
    while (i <= m - n) {
      var j = 0
      while (j < n) { window(j) = tokens.getUTF8String(i + j); j += 1 }
      // concatWs over the same tokens = the same bytes concat_ws(" ")
      // produces; seed 42 = the xxhash64() SQL function's seed
      out(i) = XxHash64Function.hash(
        UTF8String.concatWs(Space, window: _*), StringType, 42L)
      i += 1
    }
    new GenericArrayData(out)
  }

  def apply(c: Column, n: Int): Column =
    ColumnBridge.column(ShingleHashes(ColumnBridge.expression(c), n))
}
