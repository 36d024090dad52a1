package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HtmlUrlSpec extends SparkSpec {

  test("html_to_text: script/style elements drop with content, " +
    "comments drop, tags become spaces, entities decode (amp last), " +
    "whitespace collapses, unterminated '<' stays literal") {
    val s = spark
    import s.implicits._
    val rows = Seq(
      (1L, "<p>a</p>\n\t<p>b</p>"),
      (2L, "<SCRIPT>if (1 < 2) { alert(\"&amp;\"); }</script>after"),
      (3L, "<style media=\"x\">p { color: red }</STYLE >kept"),
      (4L, "x <!-- secret\nstuff --> y"),
      (5L, "&amp;lt; stays as &lt; text"),
      (6L, "broken <tag never closes"),
      (7L, "a&nbsp;b&#39;c&quot;d&apos;e&gt;f&lt;g"),
      (8L, ""),
      (9L, "   \n\r\f\t  "),
      (10L, "plain prose, untouched.")).toDF("id", "h")
    val got = rows.select(col("id"), HtmlToText(col("h")).as("t"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "a b")
    assert(got(2L) == "after")
    assert(got(3L) == "kept")
    assert(got(4L) == "x y")
    // &amp;lt; → &lt; (amp decodes LAST; the result is not re-decoded)
    assert(got(5L) == "&lt; stays as < text")
    assert(got(6L) == "broken <tag never closes")
    assert(got(7L) == "a b'c\"d'e>f<g")
    assert(got(8L) == "")
    assert(got(9L) == "")
    assert(got(10L) == "plain prose, untouched.")
  }

  test("url host + canonicalize: case folds, credentials strip, " +
    "default ports drop, params sort, fragments drop, non-URLs pass " +
    "through; stays inside whole-stage codegen") {
    val s = spark
    import s.implicits._
    val rows = Seq(
      (1L, "HTTP://User:Pw@WWW.Site.ORG:80/A/b?z=9&a=3&m=2#Frag"),
      (2L, "https://x.com:443"),
      (3L, "not a url"),
      (4L, "http://h:8080/p?b&&a"),
      (5L, "FTP://H.io:21/q"),
      (6L, "https://A.B.c/path?one=1"),
      (7L, "")).toDF("id", "u")
    val df = rows.select(col("id"),
      UrlHost(col("u")).as("h"), UrlCanonicalize(col("u")).as("c"))
    val got = df.collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    assert(got(1L) == (("www.site.org",
      "http://www.site.org/A/b?a=3&m=2&z=9")))
    assert(got(2L) == (("x.com", "https://x.com/")))
    assert(got(3L) == (("", "not a url")))
    // empty param segments are kept and sort first
    assert(got(4L) == (("h", "http://h:8080/p?&a&b")))
    assert(got(5L) == (("h.io", "ftp://h.io:21/q")))
    assert(got(6L) == (("a.b.c", "https://a.b.c/path?one=1")))
    assert(got(7L) == (("", "")))
    // native expressions: the projection must be inside codegen (a
    // range source — the literal table above constant-folds to a
    // LocalTableScan, which proves eval but not codegen)
    val ranged = spark.range(100).select(
      UrlHost(concat(lit("http://h"), col("id").cast("string"), lit(".com/p"))),
      HtmlToText(concat(lit("<p>"), col("id").cast("string"), lit("</p>"))))
    val plan = ranged.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan) // * = whole-stage codegen
    assert(ranged.collect().length == 100)
  }
}
