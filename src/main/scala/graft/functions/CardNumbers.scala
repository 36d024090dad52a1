package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Payment-card detection for PII scrubbing — the one PII class a
  * plain regex CANNOT decide: a 16-digit run is a card number or an
  * order id, and only the Luhn checksum separates them (redacting
  * every long digit run would destroy ids, timestamps and DOIs
  * corpus-wide). Native codegen expressions:
  *
  *  - [[LuhnCheck]]: Luhn checksum over a digit string — true iff all
  *    digits, 13-19 of them, and the mod-10 checksum holds;
  *  - [[CardRedact]] / [[CardCount]]: scan free text for candidate
  *    runs (maximal `digit([ -]?digit)*` — single space/dash group
  *    separators, the formats cards are actually written in), redact
  *    with `<CARD>` / count ONLY the candidates whose 13-19 digits
  *    pass Luhn. Invalid candidates pass through untouched.
  *
  * The scan is one compiled-regex pass plus an O(digits) checksum per
  * candidate; everything stays inside whole-stage codegen.
  */
case class LuhnCheck(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def prettyName: String = "luhn_check"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"luhn_check expects STRING, got ${other.sql}")
    }

  override def nullSafeEval(input: Any): Any =
    CardNumbers.luhnOk(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CardNumbers.luhnOk($c)")

  override protected def withNewChildInternal(newChild: Expression): LuhnCheck =
    copy(child = newChild)
}

case class CardRedact(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "card_redact"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"card_redact expects STRING, got ${other.sql}")
    }

  override def nullSafeEval(input: Any): Any =
    CardNumbers.redact(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CardNumbers.redact($c)")

  override protected def withNewChildInternal(newChild: Expression): CardRedact =
    copy(child = newChild)
}

case class CardCount(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "card_count"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"card_count expects STRING, got ${other.sql}")
    }

  override def nullSafeEval(input: Any): Any =
    CardNumbers.count(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CardNumbers.count($c)")

  override protected def withNewChildInternal(newChild: Expression): CardCount =
    copy(child = newChild)
}

object CardNumbers {
  // maximal digit run with single ' ' or '-' separators between
  // digits; maximality is the regex's greedy match, so a candidate
  // can never start or end on a separator
  private val Candidate = Pattern.compile("[0-9](?:[ -]?[0-9])*")

  /** Luhn over `s`'s characters: all digits, 13-19 long, mod-10 holds */
  def luhnOk(s: UTF8String): Boolean = {
    val str = s.toString
    var digits = 0
    var i = 0
    while (i < str.length) {
      val c = str.charAt(i)
      if (c < '0' || c > '9') return false
      digits += 1
      i += 1
    }
    digits >= 13 && digits <= 19 && checksumOk(str)
  }

  /** Luhn mod-10 over the digit characters WITHIN a candidate run
    * (separators already allowed by the caller's extraction) */
  private def checksumOk(run: String): Boolean = {
    var sum = 0
    var alt = false
    var i = run.length - 1
    while (i >= 0) {
      val c = run.charAt(i)
      if (c >= '0' && c <= '9') {
        var d = c - '0'
        if (alt) { d *= 2; if (d > 9) d -= 9 }
        sum += d
        alt = !alt
      }
      i -= 1
    }
    sum % 10 == 0
  }

  private def digitCount(run: String): Int = {
    var n = 0
    var i = 0
    while (i < run.length) {
      val c = run.charAt(i)
      if (c >= '0' && c <= '9') n += 1
      i += 1
    }
    n
  }

  private def isCard(run: String): Boolean = {
    val d = digitCount(run)
    d >= 13 && d <= 19 && checksumOk(run)
  }

  def redact(s: UTF8String): UTF8String = {
    val str = s.toString
    val m = Candidate.matcher(str)
    var sb: java.lang.StringBuilder = null
    var last = 0
    while (m.find()) {
      if (isCard(m.group())) {
        if (sb == null) sb = new java.lang.StringBuilder(str.length)
        sb.append(str, last, m.start()).append("<CARD>")
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
    while (m.find()) if (isCard(m.group())) n += 1
    n
  }
}

object LuhnCheck {
  def apply(c: Column): Column =
    ColumnBridge.column(LuhnCheck(ColumnBridge.expression(c)))
}

object CardRedact {
  def apply(c: Column): Column =
    ColumnBridge.column(CardRedact(ColumnBridge.expression(c)))
}

object CardCount {
  def apply(c: Column): Column =
    ColumnBridge.column(CardCount(ColumnBridge.expression(c)))
}
