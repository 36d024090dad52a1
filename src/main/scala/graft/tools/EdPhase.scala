package graft.ext

import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** dev scratch (graft.ext for Dedup internals): phase timing of
  * editDistancePairs on the q_dedup_edit_distance universe — where do
  * the warm seconds go at sf0.1.
  */
object EdPhase {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[edp] $tag ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    val docs = Tables.load(spark, sf, "documents").select("doc_id", "text")
    val u = docs.union(docs.filter(col("doc_id") % 5 === 0)
      .select((col("doc_id") + 10000).as("doc_id"),
        concat(col("text"), lit(" x")).as("text"))).localCheckpoint(true)
    println(s"[edp] docs: ${u.count()}")
    val maxDist = 3; val q = 5
    for (run <- 1 to 2) {
      val docs0 = u.filter(col("text").isNotNull)
        .select(col("doc_id").cast("long").as("id"), col("text").as("t"),
          length(col("text")).as("len"))
      val members = docs0.select(col("id"), md5(col("t")).as("fp"))
      t(s"run$run grams.count") {
        Dedup.editGramRows(u, "text", "doc_id", maxDist, q).count()
      }
      t(s"run$run prefix.count") {
        Dedup.editPrefixRows(u, "text", "doc_id", maxDist, q).count()
      }
      t(s"run$run full") {
        Dedup.editDistancePairs(u, "text", "doc_id", maxDist).count()
      }
    }
    spark.stop()
  }
}
