package graft.ext

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpec {

  test("z-ordered layout is narrow in BOTH dims per file (a single-dim " +
    "sort can't be), skew-robust via rank buckets, and lossless") {
    val s = spark
    import s.implicits._
    // two independent dims: a uniform, b a decorrelated permutation;
    // c power-law skewed (quantile buckets must still spread it)
    val n = 20000
    val rows = (0 until n).map { i =>
      val a = (i * 7919) % n           // uniform, decorrelated from id
      val b = (i * 104729) % n         // uniform, decorrelated from a
      val c = n / (1 + i % 100)        // heavy skew: 1% of values huge
      (i.toLong, a.toLong, b.toLong, c.toLong)
    }.toDF("id", "a", "b", "c").repartition(8)

    val dir = Files.createTempDirectory("graft_zorder").toString
    CorpusSink.writeZOrdered(rows, dir, Seq("a", "b"), bits = 8,
      maxRecordsPerFile = 1000)
    val back = s.read.parquet(dir)

    // lossless: same multiset of rows
    assert(back.count() == n)
    assert(back.agg(sum("a"), sum("b"), sum("c")).head() ==
      rows.agg(sum("a"), sum("b"), sum("c")).head())

    // per-file narrowness in BOTH dims at once — the z-order win. A
    // sort on `a` alone would leave every file spanning ~the full b
    // range (avg relative width ~1.0); the Morton layout keeps the
    // average file window well under half the domain in each dim.
    val widths = back.groupBy(input_file_name().as("f"))
      .agg(((max("a") - min("a")) / n.toDouble).as("wa"),
        ((max("b") - min("b")) / n.toDouble).as("wb"))
      .agg(avg("wa"), avg("wb"), count(lit(1))).head()
    val (wa, wb, files) = (widths.getDouble(0), widths.getDouble(1),
      widths.getLong(2))
    assert(files >= 8, s"expected a multi-file layout, got $files")
    assert(wa < 0.5 && wb < 0.5,
      s"files not narrow in both dims: avg widths a=$wa b=$wb over $files files")

    // skew robustness: z-order on the power-law dim still spreads rows
    // (rank bucketization) — no file holds more than the cap
    val dir2 = Files.createTempDirectory("graft_zorder_skew").toString
    CorpusSink.writeZOrdered(rows, dir2, Seq("c", "a"), bits = 8,
      maxRecordsPerFile = 1000)
    val perFile = s.read.parquet(dir2)
      .groupBy(input_file_name()).count().agg(max("count")).head().getLong(0)
    assert(perFile <= 1000, s"file exceeded cap: $perFile")
  }
}
