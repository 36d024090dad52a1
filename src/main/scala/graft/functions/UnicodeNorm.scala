package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode text canonicalization for multilingual corpora — the first
  * preprocessing step real crawl data needs (the same logical text
  * arrives composed, decomposed, or accent-spelled across sources, and
  * every hash-keyed operator downstream — exact dedup fingerprints,
  * shingles, MinHash — treats those byte-different spellings as
  * different documents unless the text is canonicalized first).
  *
  * Native codegen `Expression`s (no UDF serialization, no boxing;
  * single map pass, stays inside whole-stage codegen):
  *
  *  - [[NfcNormalize]]: canonical composition (NFC) via the JDK's
  *    `java.text.Normalizer` — `e + U+0301` and `é` become one byte
  *    sequence;
  *  - [[StripAccents]]: NFD + drop combining marks (`\p{M}`) —
  *    `é → e`, the ASCII-folding step language-id n-gram models and
  *    fuzzy matchers want. Non-Latin scripts pass through (only
  *    combining marks are removed, never base characters).
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"nfc_normalize expects STRING, got ${other.sql}")
    }

  override def nullSafeEval(input: Any): Any =
    UnicodeNorm.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.UnicodeNorm.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

case class StripAccents(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "strip_accents"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"strip_accents expects STRING, got ${other.sql}")
    }

  override def nullSafeEval(input: Any): Any =
    UnicodeNorm.stripAccents(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.UnicodeNorm.stripAccents($c)")

  override protected def withNewChildInternal(newChild: Expression): StripAccents =
    copy(child = newChild)
}

object UnicodeNorm {
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    // fast path: Normalizer.isNormalized is a cheap scan and almost
    // all real text is already NFC — skip the allocation entirely
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  private val Marks = java.util.regex.Pattern.compile("\\p{M}+")

  def stripAccents(s: UTF8String): UTF8String = {
    val nfd = java.text.Normalizer.normalize(
      s.toString, java.text.Normalizer.Form.NFD)
    val stripped = Marks.matcher(nfd).replaceAll("")
    UTF8String.fromString(java.text.Normalizer.normalize(
      stripped, java.text.Normalizer.Form.NFC))
  }

  def nfcNormalize(c: Column): Column =
    ColumnBridge.column(NfcNormalize(ColumnBridge.expression(c)))

  def stripAccentsCol(c: Column): Column =
    ColumnBridge.column(StripAccents(ColumnBridge.expression(c)))
}
