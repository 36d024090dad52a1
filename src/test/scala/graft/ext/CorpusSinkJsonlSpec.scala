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

  test("orc round-trip preserves content; filters push into the ORC " +
    "scan and a projection prunes the read schema") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_orc_spec").toString + "/corpus"
    val docs = (1L to 200L)
      .map(i => (i, s"body $i é中😀", s"src${i % 3}"))
      .toDF("doc_id", "text", "source")
    CorpusSink.writeOrc(docs, dir, sortCol = Some("doc_id"))
    val back = CorpusSink.readOrc(spark, dir, docs.schema)
    assert(back.orderBy("doc_id").collect().toSeq ==
      docs.orderBy("doc_id").collect().toSeq,
      "orc round-trip must preserve every row, unicode included")
    // the pushdown/pruning contract the scaladoc claims: an id filter
    // reaches the ORC scan as a pushed filter, and a 1-column
    // projection prunes the read schema to that column
    val plan = back.filter(col("doc_id") === 7L).select("source")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(doc_id), EqualTo(doc_id,7)]"),
      s"id filter not pushed into the ORC scan:\n$plan")
    assert(plan.contains("ReadSchema: struct<source:string>") ||
      plan.contains("ReadSchema: struct<doc_id:bigint,source:string>"),
      s"projection not pruned at the ORC scan:\n$plan")
  }
}
