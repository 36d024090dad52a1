package graft.ext

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ClusteredStoreSpec extends SparkSpec {

  private def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select("id").collect().map(_.getLong(0)).toSet

  test("create/append/read/compact: live view is always base + " +
    "committed deltas; compact folds, re-clusters and vacuums; " +
    "uncommitted orphans invisible and reclaimed") {
    val s = spark
    import s.implicits._
    def mk(r: Range) = r.map(i =>
      (i.toLong, (i * 7919 % 5000).toLong, (i * 104729 % 5000).toLong))
      .toDF("id", "a", "b")
    val root = Files.createTempDirectory("graft_cstore").toString

    ClusteredStore.create(spark, root, mk(0 until 3000), Seq("a", "b"),
      bits = 6, maxRecordsPerFile = 500)
    assert(ids(ClusteredStore.read(spark, root)) == (0L until 3000L).toSet)
    assert(ClusteredStore.deltaRows(spark, root) == 0L)

    ClusteredStore.append(spark, root, mk(3000 until 4000))
    ClusteredStore.append(spark, root, mk(4000 until 4500))
    assert(ids(ClusteredStore.read(spark, root)) == (0L until 4500L).toSet)
    assert(ClusteredStore.deltaRows(spark, root) == 1500L)

    // a crashed append: data lands, marker never written — invisible
    mk(9000 until 9100).write.parquet(s"$root/d0_99")
    assert(ids(ClusteredStore.read(spark, root)) == (0L until 4500L).toSet)
    // and the retry must not collide with the orphan dir
    ClusteredStore.append(spark, root, mk(9000 until 9100))
    assert(ids(ClusteredStore.read(spark, root)) ==
      ((0L until 4500L) ++ (9000L until 9100L)).toSet)

    ClusteredStore.compact(spark, root, Seq("a", "b"), bits = 6,
      maxRecordsPerFile = 500)
    val after = ClusteredStore.read(spark, root)
    assert(ids(after) == ((0L until 4500L) ++ (9000L until 9100L)).toSet)
    assert(ClusteredStore.deltaRows(spark, root) == 0L)

    // old epoch, its deltas and the orphan are gone; only the new base
    // (and _commits) remain
    val left = new java.io.File(root).listFiles().map(_.getName)
      .filterNot(_.startsWith("_")).toSet
    assert(left == Set("base_1"), left.toString)

    // the compacted base is clustered: every file narrow in both dims
    val widths = after
      .groupBy(input_file_name())
      .agg(((max("a") - min("a")) / 5000.0).as("wa"),
        ((max("b") - min("b")) / 5000.0).as("wb"))
      .agg(avg("wa"), avg("wb")).head()
    assert(widths.getDouble(0) < 0.6 && widths.getDouble(1) < 0.6,
      widths.toString)

    // appends keep working against the new epoch
    ClusteredStore.append(spark, root, mk(5000 until 5200))
    assert(ClusteredStore.deltaRows(spark, root) == 200L)
    assert(ids(ClusteredStore.read(spark, root)).contains(5100L))
  }

  test("schema drift refused; epoch retention keeps readable snapshots") {
    val s = spark
    import s.implicits._
    def mk(r: Range) = r.map(i => (i.toLong, i.toLong % 100)).toDF("id", "a")
    val root = Files.createTempDirectory("graft_cstore_ep").toString
    ClusteredStore.create(spark, root, mk(0 until 100), Seq("a", "id"),
      bits = 4)
    // a differing schema must be refused loudly
    val err = intercept[IllegalArgumentException] {
      ClusteredStore.append(spark, root,
        Seq((1L, "oops")).toDF("id", "a"))
    }
    assert(err.getMessage.contains("schema mismatch"))

    ClusteredStore.append(spark, root, mk(100 until 150))
    ClusteredStore.compact(spark, root, Seq("a", "id"), bits = 4,
      retainEpochs = 2)
    ClusteredStore.append(spark, root, mk(150 until 160))
    ClusteredStore.compact(spark, root, Seq("a", "id"), bits = 4,
      retainEpochs = 2)
    // epochs 1 and 2 retained; 0 vacuumed
    assert(ClusteredStore.epochs(spark, root) == Seq(1L, 2L))
    assert(ClusteredStore.readEpoch(spark, root, 1L).count() == 150L)
    assert(ClusteredStore.readEpoch(spark, root, 2L).count() == 160L)
    intercept[IllegalArgumentException] {
      ClusteredStore.readEpoch(spark, root, 0L)
    }
    // live view is the newest epoch
    assert(ids(ClusteredStore.read(spark, root)) == (0L until 160L).toSet)
  }

  test("tagged replay is a no-op ACROSS a compaction: the applied " +
    "ledger outlives the base epoch whose delta it tagged") {
    val s = spark
    import s.implicits._
    val root = Files.createTempDirectory("graft_cstore_xcompact").toString
    val d0 = (0L until 10L).map(i => (i, i % 3)).toDF("id", "a")
    ClusteredStore.create(spark, root, d0, Seq("a", "id"), bits = 4)
    val b7 = (100L until 110L).map(i => (i, i % 3)).toDF("id", "a")
    // the crash scenario from r7 ADVICE: ingest batch 7 AND compact in
    // one foreachBatch call, crash before the stream checkpoint
    // commits, then the stream replays batch 7 against the NEW base —
    // the old base's delta marker is vacuumed, so without the applied
    // ledger the rows would land twice
    ClusteredStore.append(spark, root, b7, tag = Some("b7"))
    ClusteredStore.compact(spark, root, Seq("a", "id"), bits = 4)
    ClusteredStore.append(spark, root, b7, tag = Some("b7")) // replay
    val got = ClusteredStore.read(spark, root)
    assert(got.count() == 20L, s"double-ingest: ${got.count()} rows")
    assert(got.groupBy("id").count().filter(col("count") > 1).count() == 0L)
    // a genuinely new tag still ingests normally afterwards
    ClusteredStore.append(spark, root,
      Seq((999L, 0L)).toDF("id", "a"), tag = Some("b8"))
    assert(ClusteredStore.read(spark, root).count() == 21L)
  }
}
