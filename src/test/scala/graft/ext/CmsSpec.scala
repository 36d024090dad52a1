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

  test("updateState: a commit racing the MARKER itself fails loudly on " +
      "the atomic create — committed markers are never re-pointed") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("cms_mark").toString
    val incA = Seq.fill(5)("a").toDF("t")
    Cms.updateState(incA, col("t"), dir) // v0 committed
    // writer A passes every guard and publishes its data dir; the
    // intruder then drops A's OWN marker for v1 inside the
    // rename-to-marker window (the beforeMarker seam simulates a racer
    // that won the marker create) — A's overwrite=false create must
    // throw instead of silently re-pointing the committed marker
    val conf = s.sparkContext.hadoopConfiguration
    val e = intercept[IllegalArgumentException] {
      Cms.updateStateHooked(incA, col("t"), dir,
        Cms.DefaultDepth, Cms.DefaultWidth, version = Some(1L),
        afterFold = () => (),
        beforeMarker = () => {
          val p = new org.apache.hadoop.fs.Path(s"$dir/_commits/s1")
          val f = p.getFileSystem(conf)
          f.mkdirs(p.getParent)
          val o = f.create(p, false)
          try o.write("parent=0".getBytes("UTF-8")) finally o.close()
        })
    }
    assert(e.getMessage.contains("commit marker"), e.getMessage)
    // the intruder's marker content survived untouched
    val f = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(conf)
    val in = f.open(new org.apache.hadoop.fs.Path(s"$dir/_commits/s1"))
    val body = try scala.io.Source.fromInputStream(in).mkString
      finally in.close()
    assert(body == "parent=0", body)
  }

  test("updateState: an uncommitted fold never touches committed data " +
      "dirs (temp-dir publish), and orphaned temps are swept") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("cms_tmp").toString
    val incA = Seq.fill(5)("a").toDF("t")
    val incB = Seq.fill(3)("b").toDF("t")
    Cms.updateState(incA, col("t"), dir) // v0: 5 a's
    val conf = s.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(conf)
    // plant an orphan temp (a crashed writer's leftover)
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$dir/.s9.tmp-deadbeef"))
    // a racing writer that fails its guard must leave s0 byte-identical:
    // snapshot s0's file list+sizes before, compare after
    def listing() = fs.listStatus(new org.apache.hadoop.fs.Path(s"$dir/s0"))
      .map(st => (st.getPath.getName, st.getLen, st.getModificationTime))
      .sortBy(_._1).toSeq
    val before = listing()
    intercept[IllegalArgumentException] {
      Cms.updateStateHooked(incA, col("t"), dir,
        Cms.DefaultDepth, Cms.DefaultWidth, version = None,
        afterFold = () => Cms.updateState(incB, col("t"), dir))
    }
    // v0 was swept by B's successful v1 commit — assert against the
    // SURVIVING committed version instead: state reads exactly A+B
    assert(Cms.readState(s, dir)._2 == 8)
    // B's commit swept the planted orphan
    val leftovers = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .map(_.getPath.getName).filter(_.contains(".tmp-"))
    assert(leftovers.isEmpty, leftovers.mkString(","))
    assert(before.nonEmpty) // the snapshot itself was real
  }
}
