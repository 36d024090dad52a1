package graft.tools

import graft.graph.TpchGraph
import org.apache.spark.sql.SparkSession

/** dev scratch: per-table timings of the TpchGraph build */
object BuildProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val tables = TpchGraph.tables(spark, args(0))
    tables.toSeq.sortBy(_._1).foreach { case (name, df) =>
      val s = System.nanoTime()
      val n = df.count()
      println(f"[build] $name%-10s ${(System.nanoTime() - s) / 1e9}%6.2f s  ($n rows)")
    }
    println(f"[build] TOTAL ${(System.nanoTime() - t0) / 1e9}%.2f s")
    spark.stop()
  }
}
