package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ScriptDetectSpec extends SparkSpec {

  test("dominant script: per-script letter counts, alphabetical ties, " +
    "surrogate-pair code points, letterless → none") {
    val s = spark
    import s.implicits._
    val rows = Seq(
      (1L, "hello world"),
      (2L, "Привет мир"),
      (3L, "abc αβγ"),            // 3 vs 3 — tie → greek (alphabetical)
      (4L, "... 123 !!!"),
      (5L, ""),
      (6L, "𠀀𠀁 ab"), // two supplementary Han chars
      (7L, "mixed кирилица and latin letters here"))
      .toDF("id", "t")
    val got = rows.select(col("id"),
        DominantScript(col("t")).as("d"),
        DominantScriptFrac(col("t")).as("f"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2))))
      .toMap
    assert(got(1L) == (("latin", 1.0)))
    assert(got(2L) == (("cyrillic", 1.0)))
    assert(got(3L) == (("greek", 0.5)))
    assert(got(4L) == (("none", 0.0)))
    assert(got(5L) == (("none", 0.0)))
    // 2 Han + 2 Latin — tie resolves to han; supplementary chars count
    // once each (code points, not UTF-16 units)
    assert(got(6L) == (("han", 0.5)))
    // the mixed-script doc's dominant share is well under 1 — the
    // spam/injection signal this expression exists for
    assert(got(7L)._1 == "latin" && got(7L)._2 < 0.8)
  }
}
