package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CardNumbersSpec extends SparkSpec {

  test("card redaction: Luhn-valid 13-19 digit runs redact (spaced, " +
    "dashed, bare), invalid checksums and wrong lengths survive, " +
    "adjacent text intact, multiple cards per doc") {
    val s = spark
    import s.implicits._
    val rows = Seq(
      (1L, "pay 4111 1111 1111 1111 now"),           // valid visa, spaced
      (2L, "pay 4111-1111-1111-1112 now"),           // bad checksum
      (3L, "id 12345678901 is an order"),            // 11 digits: too short
      (4L, "amex 378282246310005 ok"),               // valid 15-digit
      (5L, "a 4111111111111111 b 5500000000000004 c"), // two valid cards
      (6L, "v4.1.2 was tagged 2026-08-14 10:30"),    // version/date noise
      (7L, "30569309025904"),                        // valid diners, bare
      (8L, ""),
      (9L, "20 digits 41111111111111111115 stay")).toDF("id", "t")
    val got = rows.select(col("id"), CardRedact(col("t")).as("r"),
        CardCount(col("t")).as("n"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2))))
      .toMap
    assert(got(1L) == (("pay <CARD> now", 1)))
    assert(got(2L) == (("pay 4111-1111-1111-1112 now", 0)))
    assert(got(3L) == (("id 12345678901 is an order", 0)))
    assert(got(4L) == (("amex <CARD> ok", 1)))
    assert(got(5L) == (("a <CARD> b <CARD> c", 2)))
    assert(got(6L) == (("v4.1.2 was tagged 2026-08-14 10:30", 0)))
    assert(got(7L) == (("<CARD>", 1)))
    assert(got(8L) == (("", 0)))
    assert(got(9L) == (("20 digits 41111111111111111115 stay", 0)))
  }

  test("iban redaction: mod-97-valid IBANs redact, wrong check digit " +
    "and malformed shapes survive, multiple per doc") {
    val s = spark
    import s.implicits._
    val rows = Seq(
      (1L, "pay DE89370400440532013000 now"),        // valid
      (2L, "pay DE89370400440532013001 now"),        // bad checksum
      (3L, "GB82WEST12345698765432"),                // valid, bare
      (4L, "code DE89 split not a candidate"),       // too short
      (5L, "a DE89370400440532013000 b GB82WEST12345698765432 c"),
      (6L, ""),
      (7L, "lowercase de89370400440532013000 ignored")) // case-sensitive
      .toDF("id", "t")
    val got = rows.select(col("id"), IbanRedact(col("t")).as("r"),
        IbanCount(col("t")).as("n"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2))))
      .toMap
    assert(got(1L) == (("pay <IBAN> now", 1)))
    assert(got(2L) == (("pay DE89370400440532013001 now", 0)))
    assert(got(3L) == (("<IBAN>", 1)))
    assert(got(4L) == (("code DE89 split not a candidate", 0)))
    assert(got(5L) == (("a <IBAN> b <IBAN> c", 2)))
    assert(got(6L) == (("", 0)))
    assert(got(7L)._2 == 0)
  }

  test("luhn_check: strict digit-string validation") {
    val s = spark
    import s.implicits._
    val got = Seq(
      ("4111111111111111", true),   // valid
      ("4111111111111112", false),  // checksum off by one
      ("378282246310005", true),    // 15-digit amex
      ("41111111", false),          // too short even if mod-10 held
      ("4111 1111 1111 1111", false), // separators not allowed HERE
      ("", false)).toDF("d", "want")
      .select(LuhnCheck(col("d")).as("got"), col("want"))
      .collect()
    got.foreach(r => assert(r.getBoolean(0) == r.getBoolean(1), r.toString))
  }
}
