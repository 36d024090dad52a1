package graft.tools

import graft.Tables
import graft.ext.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** dev scratch: index-build vs probe split of the incremental
  * edit-distance row at a given SF, two runs for warm shape */
object EdIncProfile {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](name: String)(f: => T): T = {
      val s = System.nanoTime()
      val r = f
      println(f"[edinc] $name%-22s ${(System.nanoTime() - s) / 1e9}%6.2f s")
      r
    }
    val docs = Tables.load(spark, sf, "documents").select("doc_id", "text")
      .localCheckpoint(true)
    val hist = docs.filter(col("doc_id") % 10 =!= 0)
    val inc0 = docs.filter(col("doc_id") % 10 === 0)
    val inc = inc0.union(inc0.filter(col("doc_id") % 20 === 0)
      .select((col("doc_id") + 10000).as("doc_id"),
        concat(col("text"), lit(" x")).as("text")))
    for (run <- 1 to 2) {
      val idx = java.nio.file.Files
        .createTempDirectory("edinc_prof").toString
      time(s"run $run index build") {
        Dedup.writeEditIndex(hist, "text", "doc_id", idx, maxDist = 3)
      }
      val n = time(s"run $run probe") {
        Dedup.editDistancePairsIncremental(spark, inc, hist, idx,
          "text", "doc_id", maxDist = 3).count()
      }
      println(s"[edinc] run $run pairs: $n")
    }
    spark.stop()
  }
}
