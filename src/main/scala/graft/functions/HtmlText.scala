package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** HTML → text extraction — the step web-crawl corpora (the C4/CCNet
  * lineage the curation pipeline mirrors) need before ANY text
  * operator runs: language-id, quality gates, shingles and dedup
  * fingerprints all assume prose, and markup inflates token counts
  * and poisons n-gram statistics.
  *
  * The transform is a PRECISELY specified pipeline (each step is
  * plain-SQL-expressible, which is what lets a DuckDB oracle replay
  * it byte-for-byte):
  *
  *   1. drop `<script …>…</script>` and `<style …>…</style>`
  *      ELEMENTS (tag + content; lazy match, case-insensitive,
  *      dot-matches-newline) — their content is code, not prose;
  *   2. drop HTML comments `<!-- … -->` (lazy);
  *   3. replace every remaining tag `<[^>]*>` with one space (an
  *      unterminated `<` is NOT a tag and stays literal);
  *   4. decode the named entities text nodes carry — `&lt; &gt;
  *      &quot; &apos; &#39; &nbsp;` then `&amp;` LAST (so
  *      `&amp;lt;` decodes to the literal `&lt;`, matching HTML
  *      semantics; decoded entities are never re-parsed as markup);
  *   5. collapse `[ \t\n\r\f]+` runs to one space and trim.
  *
  * Runs as a native codegen `Expression` (no UDF boxing, stays inside
  * whole-stage codegen); the regexes are compiled once per JVM. One
  * row costs a handful of linear scans — the same order as the
  * tokenizer that runs next.
  */
case class HtmlToText(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "html_to_text"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"html_to_text expects STRING, got ${other.sql}")
    }

  override def nullSafeEval(input: Any): Any =
    HtmlText.toText(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HtmlText.toText($c)")

  override protected def withNewChildInternal(newChild: Expression): HtmlToText =
    copy(child = newChild)
}

object HtmlText {
  // Pattern is thread-safe (matchers are created per call); compiled
  // once per JVM. (?is) = CASE_INSENSITIVE | DOTALL, same semantics
  // as RE2's (?is) on these constructs — both engines agree on
  // character classes, lazy quantifiers and alternation; nothing
  // backtracking-exotic is used.
  // two explicit patterns, not one with a backreference — the oracle
  // side runs on RE2, which has no backreferences
  private val Script = Pattern.compile("(?is)<script\\b[^>]*>.*?</script\\s*>")
  private val Style = Pattern.compile("(?is)<style\\b[^>]*>.*?</style\\s*>")
  private val Comment = Pattern.compile("(?s)<!--.*?-->")
  private val Tag = Pattern.compile("<[^>]*>")
  private val Ws = Pattern.compile("[ \\t\\n\\r\\f]+")

  def toText(s: UTF8String): UTF8String = {
    var t = s.toString
    t = Script.matcher(t).replaceAll("")
    t = Style.matcher(t).replaceAll("")
    t = Comment.matcher(t).replaceAll("")
    t = Tag.matcher(t).replaceAll(" ")
    // named entities; &amp; strictly last
    t = t.replace("&lt;", "<").replace("&gt;", ">")
      .replace("&quot;", "\"").replace("&apos;", "'")
      .replace("&#39;", "'").replace("&nbsp;", " ")
      .replace("&amp;", "&")
    t = Ws.matcher(t).replaceAll(" ")
    // collapse leaves at most one leading/trailing space
    if (t.startsWith(" ")) t = t.substring(1)
    if (t.endsWith(" ")) t = t.substring(0, t.length - 1)
    UTF8String.fromString(t)
  }

  /** the DuckDB replay of [[toText]] applied to SQL text expression
    * `e` — kept beside the implementation so the two specifications
    * cannot drift apart silently */
  def oracleSqlFor(e: String): String =
    s"""trim(regexp_replace(
       |  replace(replace(replace(replace(replace(replace(replace(
       |    regexp_replace(
       |      regexp_replace(
       |        regexp_replace(
       |          regexp_replace($e,
       |            '(?is)<script\\b[^>]*>.*?</script\\s*>', '', 'g'),
       |          '(?is)<style\\b[^>]*>.*?</style\\s*>', '', 'g'),
       |        '(?s)<!--.*?-->', '', 'g'),
       |      '<[^>]*>', ' ', 'g'),
       |    '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&apos;', ''''),
       |    '&#39;', ''''), '&nbsp;', ' '), '&amp;', '&'),
       |  '[ \\t\\n\\r\\f]+', ' ', 'g'))""".stripMargin
}

object HtmlToText {
  def apply(c: Column): Column =
    ColumnBridge.column(HtmlToText(ColumnBridge.expression(c)))
}
