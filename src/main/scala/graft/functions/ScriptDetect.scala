package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode-script profiling — the multilingual complement to the
  * n-gram language-id heuristic: langid models confuse languages that
  * SHARE a script, but "this document is 92% Cyrillic letters" is a
  * deterministic property no model can get wrong, and mixed-script
  * documents (a classic spam/injection signal) show up as a low
  * dominant fraction. Two native codegen expressions over one shared
  * letter walk:
  *
  *  - [[DominantScript]]: the most frequent script among LETTER code
  *    points, from a fixed 10-script set (`latin cyrillic greek han
  *    arabic hebrew hangul hiragana katakana devanagari`, everything
  *    else `other`), ties to the alphabetically first name, `none`
  *    when the text has no letters;
  *  - [[DominantScriptFrac]]: that script's share of all letters,
  *    rounded to 6 places (0.0 for `none`).
  *
  * The script classes mirror RE2/DuckDB's `\p{Script}` properties, so
  * an external engine replays the counts with `regexp_extract_all`.
  */
case class DominantScript(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "dominant_script"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"dominant_script expects STRING, got ${other.sql}")
    }

  override def nullSafeEval(input: Any): Any =
    ScriptDetect.dominant(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ScriptDetect.dominant($c)")

  override protected def withNewChildInternal(newChild: Expression): DominantScript =
    copy(child = newChild)
}

case class DominantScriptFrac(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dominant_script_frac"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"dominant_script_frac expects STRING, got ${other.sql}")
    }

  override def nullSafeEval(input: Any): Any =
    ScriptDetect.dominantFrac(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ScriptDetect.dominantFrac($c)")

  override protected def withNewChildInternal(newChild: Expression): DominantScriptFrac =
    copy(child = newChild)
}

object ScriptDetect {
  // alphabetical — the tie-break order is the array order
  private val Names = Array("arabic", "cyrillic", "devanagari", "greek",
    "han", "hangul", "hebrew", "hiragana", "katakana", "latin", "other")
  private val Scripts = Array(
    Character.UnicodeScript.ARABIC, Character.UnicodeScript.CYRILLIC,
    Character.UnicodeScript.DEVANAGARI, Character.UnicodeScript.GREEK,
    Character.UnicodeScript.HAN, Character.UnicodeScript.HANGUL,
    Character.UnicodeScript.HEBREW, Character.UnicodeScript.HIRAGANA,
    Character.UnicodeScript.KATAKANA, Character.UnicodeScript.LATIN)

  /** (winner index into Names or -1 for none, winner count, letters) */
  private def profile(s: UTF8String): (Int, Int, Int) = {
    val str = s.toString
    val counts = new Array[Int](Names.length)
    var letters = 0
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      if (Character.isLetter(cp)) {
        letters += 1
        val sc = Character.UnicodeScript.of(cp)
        var j = 0
        var hit = false
        while (j < Scripts.length && !hit) {
          if (Scripts(j) == sc) { counts(j) += 1; hit = true }
          j += 1
        }
        if (!hit) counts(Names.length - 1) += 1
      }
      i += Character.charCount(cp)
    }
    if (letters == 0) return (-1, 0, 0)
    var best = 0
    var j = 1
    while (j < counts.length) {
      if (counts(j) > counts(best)) best = j
      j += 1
    }
    (best, counts(best), letters)
  }

  def dominant(s: UTF8String): UTF8String = {
    val (w, _, _) = profile(s)
    UTF8String.fromString(if (w < 0) "none" else Names(w))
  }

  def dominantFrac(s: UTF8String): Double = {
    val (w, c, n) = profile(s)
    if (w < 0) 0.0
    else new java.math.BigDecimal(c.toDouble / n)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
  }

  /** DuckDB replay over SQL text expression `e`: per-script letter
    * counts via `\p{Script}` classes, alphabetical-first argmax, share
    * of `\p{L}` letters — kept beside the implementation */
  def oracleSqlFor(e: String): (String, String) = {
    val classes = Seq("Arabic" -> "arabic", "Cyrillic" -> "cyrillic",
      "Devanagari" -> "devanagari", "Greek" -> "greek", "Han" -> "han",
      "Hangul" -> "hangul", "Hebrew" -> "hebrew", "Hiragana" -> "hiragana",
      "Katakana" -> "katakana", "Latin" -> "latin")
    val cnt = classes.map { case (cls, _) =>
      s"len(regexp_extract_all($e, '[\\p{$cls}]'))"
    }
    val letters = s"len(regexp_extract_all($e, '[\\p{L}]'))"
    val otherCnt = s"($letters - (${cnt.mkString(" + ")}))"
    // struct_pack + list argmax keeps the tie-break explicit: sort by
    // (count DESC, name ASC), take the head
    val entries = classes.map(_._2).zip(cnt) :+ ("other" -> otherCnt)
    val lst = entries.map { case (n, c) =>
      s"{{'s': '$n', 'c': $c}}".replace("{{", "{").replace("}}", "}")
    }.mkString(", ")
    val winner = s"(SELECT s.x FROM (SELECT unnest([$lst]) AS x) s " +
      "ORDER BY s.x.c DESC, s.x.s LIMIT 1)"
    val dom = s"CASE WHEN $letters = 0 THEN 'none' ELSE $winner.s END"
    val frac = s"CASE WHEN $letters = 0 THEN 0.0 " +
      s"ELSE ROUND($winner.c * 1.0 / $letters, 6) END"
    (dom, frac)
  }
}

object DominantScript {
  def apply(c: Column): Column =
    ColumnBridge.column(DominantScript(ColumnBridge.expression(c)))
}

object DominantScriptFrac {
  def apply(c: Column): Column =
    ColumnBridge.column(DominantScriptFrac(ColumnBridge.expression(c)))
}
