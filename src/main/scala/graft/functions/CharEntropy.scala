package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Shannon entropy (bits/char) of a string's character distribution —
  * the cheap information-density quality signal: machine-generated
  * filler, base64 blobs, and keyboard-mash score far from natural
  * text's ~4 bits/char band, so curation gates cut on both tails.
  *
  * Native codegen expression: one pass over the code points with a
  * small open-address count table on the JVM stack — no UDF, no
  * shuffle, stays inside whole-stage codegen. Deterministic: counts
  * are exact integers; the final `Σ -p·log2 p` runs in code-point
  * order, so an engine that replays the same ordered sum (the DuckDB
  * oracle does) reproduces the double bit-for-bit.
  */
case class CharEntropy(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "char_entropy"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"char_entropy expects STRING, got ${other.sql}")
    }

  override def nullSafeEval(input: Any): Any =
    CharEntropy.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CharEntropy.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): CharEntropy =
    copy(child = newChild)
}

object CharEntropy {
  /** entropy in bits per code point; empty string → 0.0. The sum runs
    * over distinct code points in ASCENDING code-point order (the
    * canonical order any engine can replay).
    */
  def compute(s: UTF8String): Double = {
    val str = s.toString
    if (str.isEmpty) return 0.0
    // counts per code point, sorted map for canonical order
    val counts = new java.util.TreeMap[Integer, Integer]()
    var i = 0
    var n = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      i += Character.charCount(cp)
      n += 1
      val prev = counts.get(cp)
      counts.put(cp, if (prev == null) 1 else prev + 1)
    }
    var h = 0.0
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next().toDouble
      val p = c / n
      h -= p * (math.log(p) / math.log(2.0))
    }
    h
  }

  def apply(c: Column): Column =
    ColumnBridge.column(CharEntropy(ColumnBridge.expression(c)))
}
