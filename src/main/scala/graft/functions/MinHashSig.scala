package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** MinHash signature over a doc's xxhash64'd shingle array: for perm i,
  * min over shingles of `(a_i * (h mod p) + b_i) mod p` with the same
  * deterministic 31-bit universal-hash family as the SQL formulation —
  * but all `numPerms` permutations computed in one tight JVM pass per
  * row instead of `numPerms` interpreted higher-order expressions
  * (~10× on the signature stage). Codegen keeps it inside whole-stage
  * compiled plans.
  */
case class MinHashSig(child: Expression, numPerms: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_sig expects ARRAY<BIGINT>, got ${other.sql}")
    }

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      MinHashSig.compute(input.asInstanceOf[ArrayData].toLongArray(), numPerms))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.MinHashSig.compute($c.toLongArray(), $numPerms))")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  /** largest prime < 2^31; a*h+b stays well inside a signed 64-bit long */
  val P = 2147483629L

  def compute(hashes: Array[Long], numPerms: Int): Array[Long] = {
    val sig = Array.fill(numPerms)(Long.MaxValue)
    var j = 0
    while (j < hashes.length) {
      val h = java.lang.Math.floorMod(hashes(j), P)
      var i = 0
      while (i < numPerms) {
        val a = 1234567891L + 2L * i
        val b = 987654321L * (i + 1)
        val v = java.lang.Math.floorMod(h * a + b, P)
        if (v < sig(i)) sig(i) = v
        i += 1
      }
      j += 1
    }
    sig
  }

  def apply(c: Column, numPerms: Int): Column =
    ColumnBridge.column(MinHashSig(ColumnBridge.expression(c), numPerms))
}
