package graft.tools
import org.apache.spark.sql.SparkSession
object HHProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[hh] $tag ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    time("warm-read")(graft.Tables.load(spark, sfDir, "documents").count())
    (1 to 3).foreach { i =>
      time(s"run$i")(graft.SparkEntry.queries("q_heavy_hitters")(spark, sfDir).count())
    }
    graft.SparkEntry.queries("q_heavy_hitters")(spark, sfDir).explain("formatted")
    spark.stop()
  }
}
