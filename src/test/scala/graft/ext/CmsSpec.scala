package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CmsSpec extends SparkSpec {

  private def items = {
    val s = spark
    import s.implicits._
    // zipfish stream: token i appears 101-i times
    (1 to 100).flatMap(i => Seq.fill(101 - i)(s"tok$i"))
      .toDF("t").repartition(8)
  }

  test("CMS estimates are upper bounds and exact when the table is sparse") {
    val df = items
    val sk = Cms.sketch(df, col("t"), depth = 5, width = 2048)
    val got = df.groupBy("t").agg(count(lit(1)).as("exact"))
      .withColumn("est", Cms.estimateCol(col("t"), sk, 5, 2048))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.nonEmpty)
    got.foreach { case (t, exact, est) =>
      assert(est >= exact, s"$t: est $est < exact $exact")
    }
    // 100 distinct items into 5 rows of 2048 cells: collisions are
    // possible but the MIN over 5 independent rows is exact here
    assert(got.forall { case (_, exact, est) => est == exact })
  }

  test("per-shard sketches merge to the global sketch (exact algebra)") {
    val df = items.withColumn("shard", pmod(crc32(col("t")), lit(3)))
    val global = Cms.sketch(df, col("t"))
    val rolled = (0 until 3)
      .map(sh => Cms.sketch(df.filter(col("shard") === sh), col("t")))
      .reduce(Cms.merge)
    assert(rolled.toSeq == global.toSeq)
  }

  test("width=1 degenerates to the stream length (forced collisions " +
    "still upper-bound)") {
    val df = items
    val n = df.count()
    val sk = Cms.sketch(df, col("t"), depth = 2, width = 1)
    assert(sk.toSeq == Seq(n, n))
    val est = df.limit(1)
      .select(Cms.estimateCol(col("t"), sk, 2, 1)).head().getLong(0)
    assert(est == n)
  }

  test("depth outside [1,7] is rejected") {
    val df = items
    intercept[Exception] { Cms.sketch(df, col("t"), depth = 8) }
    intercept[Exception] { Cms.sketch(df, col("t"), depth = 0) }
  }
}
