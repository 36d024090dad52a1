package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CharEntropySpec extends SparkSpec {

  test("entropy separates uniform, repetitive and empty strings; " +
    "hand-computed values match") {
    val s = spark
    import s.implicits._
    val rows = Seq(
      (1L, "aaaa"),       // one symbol → 0 bits
      (2L, "abab"),       // two equiprobable symbols → 1 bit
      (3L, "abcd"),       // four equiprobable → 2 bits
      (4L, "aab"),        // 2/3, 1/3 → ~0.9183
      (5L, ""),           // empty → 0
      (6L, "😀😀🙂")).toDF("id", "t") // code points, not UTF-16 units
    val got = rows.select(col("id"), CharEntropy(col("t")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(1L) == 0.0)
    assert(math.abs(got(2L) - 1.0) < 1e-12)
    assert(math.abs(got(3L) - 2.0) < 1e-12)
    val expect4 = -(2.0 / 3) * (math.log(2.0 / 3) / math.log(2)) -
      (1.0 / 3) * (math.log(1.0 / 3) / math.log(2))
    assert(math.abs(got(4L) - expect4) < 1e-12)
    assert(got(5L) == 0.0)
    // 2-vs-1 over surrogate-pair emoji == the "aab" distribution
    assert(math.abs(got(6L) - expect4) < 1e-12)
    // natural text sits in the expected band
    val nat = Seq(Tuple1("the quick brown fox jumps over the lazy dog"))
      .toDF("t").select(CharEntropy(col("t"))).head().getDouble(0)
    assert(nat > 3.0 && nat < 5.0)
  }
}
