package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class UnicodeNormSpec extends SparkSpec {

  test("NFC composes decomposed sequences; already-normal text passes " +
    "through; accent strip folds to base letters, non-Latin untouched") {
    val s = spark
    import s.implicits._
    val rows = Seq(
      (1L, "Cafe\u0301"),         // decomposed: e + combining acute
      (2L, "Caf\u00e9"),             // composed é
      (3L, "plain ascii"),
      (4L, "\u00dcber stra\u00dfe"), // composed Ü; ß carries no accent
      (5L, "\u4e2d\u6587 \u03b3\u03bb\u03ce\u03c3\u03c3\u03b1"),
      (6L, "")).toDF("id", "t")
    val got = rows.select(col("id"),
      UnicodeNorm.nfcNormalize(col("t")).as("nfc"),
      UnicodeNorm.stripAccentsCol(col("t")).as("st"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(2)))
      .toMap
    // 1 and 2 converge to the same bytes under NFC → exact-dedup
    // fingerprints now see them as the same document
    assert(got(1L)._1 == got(2L)._1)
    assert(got(1L)._1 == "Caf\u00e9")
    assert(got(1L)._2 == "Cafe" && got(2L)._2 == "Cafe")
    assert(got(3L) == (("plain ascii", "plain ascii")))
    assert(got(4L)._2 == "Uber stra\u00dfe")
    // accent strip removes the Greek tonos but keeps every base char
    assert(got(5L)._2 ==
      "\u4e2d\u6587 \u03b3\u03bb\u03c9\u03c3\u03c3\u03b1")
    assert(got(6L) == (("", "")))
    // null propagates, not crashes
    val n = Seq((7L, null.asInstanceOf[String])).toDF("id", "t")
      .select(UnicodeNorm.nfcNormalize(col("t"))).collect()
    assert(n.head.isNullAt(0))
  }
}
