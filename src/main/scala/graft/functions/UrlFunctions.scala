package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** URL normalization for web-crawl curation — URL-keyed dedup and
  * domain-level filtering/quotas both break when the same page
  * arrives as `HTTP://Example.COM:80/a?b=2&a=1#x` in one crawl and
  * `http://example.com/a?a=1&b=2` in the next. Two native codegen
  * expressions:
  *
  *  - [[UrlHost]]: the lowercased host (no userinfo, no port) — the
  *    key for domain quotas/blocklists; `''` when the input does not
  *    parse as an absolute URL (regexp-extract semantics, so the
  *    DuckDB replay agrees on non-URLs);
  *  - [[UrlCanonicalize]]: lowercased scheme+host, credentials
  *    stripped, default ports dropped (http:80 / https:443), empty
  *    path → `/`, query parameters sorted lexicographically (empty
  *    segments kept), fragment dropped. Inputs with no parseable
  *    host pass through unchanged.
  *
  * Every component is extracted by an INDEPENDENT anchored regex (the
  * exact patterns the DuckDB oracle replays via `regexp_extract`), so
  * both engines agree by construction even on malformed inputs: the
  * components are whatever those regexes say, and the rebuild is pure
  * string assembly. Percent-encoding is preserved as-is; IPv6 bracket
  * hosts and dot-segment resolution are out of scope (documented, not
  * silently wrong: a bracket host fails the host regex and the URL
  * passes through unchanged).
  */
case class UrlHost(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "url_host"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"url_host expects STRING, got ${other.sql}")
    }

  override def nullSafeEval(input: Any): Any =
    Urls.host(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Urls.host($c)")

  override protected def withNewChildInternal(newChild: Expression): UrlHost =
    copy(child = newChild)
}

case class UrlCanonicalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "url_canonicalize"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"url_canonicalize expects STRING, got ${other.sql}")
    }

  override def nullSafeEval(input: Any): Any =
    Urls.canonicalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Urls.canonicalize($c)")

  override protected def withNewChildInternal(newChild: Expression): UrlCanonicalize =
    copy(child = newChild)
}

object Urls {
  // the EXACT patterns the oracle replays (regexp_extract group 1);
  // java.util.regex and RE2 agree on these constructs
  private val SchemeP = Pattern.compile("^([a-zA-Z][a-zA-Z0-9+.-]*)://")
  private val HostP = Pattern.compile(
    "^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#]*@)?([^/:?#]+)")
  private val PortP = Pattern.compile(
    "^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#]*@)?[^/:?#]+:([0-9]+)")
  private val PathP = Pattern.compile(
    "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)")
  private val QueryP = Pattern.compile("^[^#]*?\\?([^#]*)")

  private def extract(p: Pattern, s: String): String = {
    val m = p.matcher(s)
    if (m.find()) m.group(1) else ""
  }

  def host(u: UTF8String): UTF8String =
    UTF8String.fromString(
      extract(HostP, u.toString).toLowerCase(java.util.Locale.ROOT))

  def canonicalize(u: UTF8String): UTF8String = {
    val s = u.toString
    val host = extract(HostP, s).toLowerCase(java.util.Locale.ROOT)
    if (host.isEmpty) return u
    val scheme = extract(SchemeP, s).toLowerCase(java.util.Locale.ROOT)
    val port = extract(PortP, s)
    val path = extract(PathP, s)
    val query = extract(QueryP, s)
    val sb = new java.lang.StringBuilder(s.length)
    sb.append(scheme).append("://").append(host)
    val defaultPort = (scheme == "http" && port == "80") ||
      (scheme == "https" && port == "443")
    if (port.nonEmpty && !defaultPort) sb.append(':').append(port)
    sb.append(if (path.isEmpty) "/" else path)
    if (query.nonEmpty) {
      // split("&", -1): empty segments are kept, exactly like the
      // oracle's string_split; lexicographic sort on the raw segments
      val parts = query.split("&", -1)
      java.util.Arrays.sort(parts, java.util.Comparator.naturalOrder[String]())
      sb.append('?').append(String.join("&", parts: _*))
    }
    UTF8String.fromString(sb.toString)
  }

  /** DuckDB replay of [[host]] over SQL expression `e` */
  def hostOracleSqlFor(e: String): String =
    s"lower(regexp_extract($e, " +
      s"'^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#]*@)?([^/:?#]+)', 1))"

  /** DuckDB replay of [[canonicalize]] over SQL expression `e` —
    * kept beside the implementation so the specifications cannot
    * drift apart */
  def canonOracleSqlFor(e: String): String =
    s"""(WITH __c AS (SELECT
       |  lower(regexp_extract($e, '^([a-zA-Z][a-zA-Z0-9+.-]*)://', 1)) AS sch,
       |  ${hostOracleSqlFor(e)} AS h,
       |  regexp_extract($e,
       |    '^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#]*@)?[^/:?#]+:([0-9]+)', 1) AS prt,
       |  regexp_extract($e,
       |    '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)', 1) AS pth,
       |  regexp_extract($e, '^[^#]*?\\?([^#]*)', 1) AS q)
       |SELECT CASE WHEN h = '' THEN $e ELSE
       |  sch || '://' || h ||
       |  CASE WHEN prt = '' OR (sch = 'http' AND prt = '80')
       |         OR (sch = 'https' AND prt = '443')
       |       THEN '' ELSE ':' || prt END ||
       |  CASE WHEN pth = '' THEN '/' ELSE pth END ||
       |  CASE WHEN q = '' THEN ''
       |       ELSE '?' || array_to_string(list_sort(string_split(q, '&')), '&')
       |  END
       |END FROM __c)""".stripMargin
}

object UrlHost {
  def apply(c: Column): Column =
    ColumnBridge.column(UrlHost(ColumnBridge.expression(c)))
}

object UrlCanonicalize {
  def apply(c: Column): Column =
    ColumnBridge.column(UrlCanonicalize(ColumnBridge.expression(c)))
}
