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

  test("updateState: interleaved second writer trips the lost-update " +
      "guard; the intruder's committed fold survives intact") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("cms_state").toString
    val incA = Seq.fill(5)("a").toDF("t")
    val incB = Seq.fill(3)("b").toDF("t")
    Cms.updateState(incA, col("t"), dir) // v0: 5 a's committed
    // writer A reads committed max v0 and folds; writer B commits v1
    // inside A's race window (the afterFold seam) — A's commit must
    // throw the documented require, BEFORE touching B's committed data
    val e = intercept[IllegalArgumentException] {
      Cms.updateStateHooked(incA, col("t"), dir,
        Cms.DefaultDepth, Cms.DefaultWidth, version = None,
        afterFold = () => Cms.updateState(incB, col("t"), dir))
    }
    assert(e.getMessage.contains("concurrent writer"), e.getMessage)
    // B's v1 fold survived: state is (5 a's + 3 b's), A's double-fold
    // of incA absent — the pre-write guard position is what protects
    // the committed s1 data dir from being overwritten
    val (sk, n) = Cms.readState(s, dir)
    assert(n == 8, s"exact counter n=$n, want 8 (A's lost fold rejected)")
    val est = Seq("a", "b").toDF("t")
      .select(col("t"),
        Cms.estimateCol(col("t"), sk, Cms.DefaultDepth, Cms.DefaultWidth)
          .as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est("a") >= 5 && est("b") >= 3, est.toString)
    // replay of the committed v1 stays a no-op after the restructure
    Cms.updateState(incB, col("t"), dir, version = Some(1L))
    assert(Cms.readState(s, dir)._2 == 8)
  }
}
