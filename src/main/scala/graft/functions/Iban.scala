package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** IBAN detection for PII scrubbing — the second checksum-gated PII
  * class next to [[CardRedact]]: an IBAN-shaped token (`CCnn` + 11-30
  * alphanumerics, uppercase by standard) is only redacted when the
  * ISO 13616 mod-97 checksum holds, so order codes and product SKUs
  * that merely look bank-ish survive. Candidates are whole uppercase
  * alphanumeric words; the checksum is the standard rearrangement
  * (first four chars to the tail, A→10…Z→35, big number ≡ 1 mod 97)
  * computed with a streaming modulus — no big-integer allocation.
  */
case class IbanRedact(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "iban_redact"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"iban_redact expects STRING, got ${other.sql}")
    }

  override def nullSafeEval(input: Any): Any =
    Iban.redact(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Iban.redact($c)")

  override protected def withNewChildInternal(newChild: Expression): IbanRedact =
    copy(child = newChild)
}

case class IbanCount(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "iban_count"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"iban_count expects STRING, got ${other.sql}")
    }

  override def nullSafeEval(input: Any): Any =
    Iban.count(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Iban.count($c)")

  override protected def withNewChildInternal(newChild: Expression): IbanCount =
    copy(child = newChild)
}

object Iban {
  // two uppercase letters + two digits + 11-30 alphanumerics, as a
  // whole word — the ISO 13616 surface form
  private val Candidate =
    Pattern.compile("\\b[A-Z]{2}[0-9]{2}[A-Z0-9]{11,30}\\b")

  /** ISO 13616 mod-97 over an already-extracted candidate */
  def checksumOk(s: String): Boolean = {
    // rearranged = s[4..] + s[0..4); fold digits with a streaming mod
    var m = 0L
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt((i + 4) % n)
      if (c >= '0' && c <= '9') m = (m * 10 + (c - '0')) % 97
      else if (c >= 'A' && c <= 'Z') {
        val v = c - 'A' + 10
        m = (m * 100 + v) % 97
      } else return false
      i += 1
    }
    m == 1
  }

  def redact(s: UTF8String): UTF8String = {
    val str = s.toString
    val m = Candidate.matcher(str)
    var sb: java.lang.StringBuilder = null
    var last = 0
    while (m.find()) {
      if (checksumOk(m.group())) {
        if (sb == null) sb = new java.lang.StringBuilder(str.length)
        sb.append(str, last, m.start()).append("<IBAN>")
        last = m.end()
      }
    }
    if (sb == null) s
    else {
      sb.append(str, last, str.length)
      UTF8String.fromString(sb.toString)
    }
  }

  def count(s: UTF8String): Int = {
    val m = Candidate.matcher(s.toString)
    var n = 0
    while (m.find()) if (checksumOk(m.group())) n += 1
    n
  }
}

object IbanRedact {
  def apply(c: Column): Column =
    ColumnBridge.column(IbanRedact(ColumnBridge.expression(c)))
}

object IbanCount {
  def apply(c: Column): Column =
    ColumnBridge.column(IbanCount(ColumnBridge.expression(c)))
}
