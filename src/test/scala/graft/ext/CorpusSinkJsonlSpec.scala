package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class CorpusSinkJsonlSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("text", StringType)))

  test("jsonl round-trip preserves content incl. JSON-hostile strings") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "plain text"),
      (2L, "quotes \" and \\ backslashes"),
      (3L, "newline\nand\ttab"),
      (4L, "unicode é中文 😀")).toDF("id", "text")
    val dir = java.nio.file.Files
      .createTempDirectory("graft_jsonl_spec").toString
    CorpusSink.writeJsonl(docs, dir)
    val (good, bad) = CorpusSink.readJsonl(spark, dir, schema)
    assert(bad.isEmpty)
    val got = good.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val want = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == want)
  }

  test("corrupt lines quarantine; parseable lines with missing fields " +
    "surface as nulls, not crashes") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_jsonl_bad").toString
    Seq(
      """{"id": 1, "text": "ok"}""",
      """{"id": 2}""",
      """not json at all {{{""",
      """{"id": 3, "text": "fine"}""")
      .toDF("value").coalesce(1).write.mode("overwrite").text(dir)
    val (good, bad) = CorpusSink.readJsonl(spark, dir, schema)
    assert(bad.collect().map(_.getString(0)).toSeq ==
      Seq("not json at all {{{"))
    val rows = good.collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(rows == Map(1L -> Some("ok"), 2L -> None, 3L -> Some("fine")))
  }
}
