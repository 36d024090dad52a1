package graft.tools

import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** dev scratch: wall time of editDistancePairs on the bench fixture
  * (the q_dedup_edit_distance universe) at a given SF — run twice in
  * one JVM so the second number is the warm bench-median shape.
  */
object EdProfile {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.load(spark, sf, "documents").select("doc_id", "text")
    val u = docs.union(docs.filter(col("doc_id") % 5 === 0)
      .select((col("doc_id") + 10000).as("doc_id"),
        concat(col("text"), lit(" x")).as("text"))).localCheckpoint(true)
    println(s"[ed] docs: ${u.count()}")
    for (run <- 1 to 2) {
      val t0 = System.nanoTime()
      val n = graft.ext.Dedup
        .editDistancePairs(u, "text", "doc_id", maxDist = 3).count()
      println(f"[ed] run $run: ${(System.nanoTime() - t0) / 1e9}%6.2f s " +
        s"($n pairs)")
    }
    spark.stop()
  }
}
