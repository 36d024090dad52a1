package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CharGramHashesSpec extends SparkSpec {

  test("value-identical to the SQL substring/xxhash64 lambda, " +
    "including multi-byte codepoints; short strings empty") {
    val s = spark
    import s.implicits._
    val q = 5
    val rows = Seq(
      (1L, "hello world, a plain ascii sentence"),
      (2L, "naïve café — déjà vu über alles"),       // 2-byte seqs
      (3L, "😀😀🙂 emoji 😀 mixed in the stream ok"), // 4-byte seqs
      (4L, "abcd"),                                   // len < q → empty
      (5L, "abcde"),                                  // exactly q
      (6L, "aaaaaaaaaa")).toDF("id", "t")             // repeats
    val native = rows.select(col("id"),
      CharGramHashes(col("t"), q).as("g"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val sql = rows.withColumn("len", length(col("t")))
      .select(col("id"), expr(
        s"""CASE WHEN len < $q THEN array()
           |ELSE transform(sequence(1, len - ${q - 1}),
           |  i -> xxhash64(substring(t, i, $q))) END""".stripMargin)
        .as("g"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(native == sql,
      native.keys.filter(k => native(k) != sql(k)).toString)
    assert(native(4L).isEmpty)
    assert(native(5L).size == 1)
  }
}
