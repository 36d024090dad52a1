package graft.tools

import org.apache.spark.sql.SparkSession

/** dev scratch: isolate environment overhead — times trivial Spark jobs
  * (empty job, small shuffle, parquet read, small parquet write) to tell
  * machine/JVM regressions apart from plan regressions.
  */
object EnvProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Unit): Unit = {
      val s = System.nanoTime()
      f
      println(f"[env] $name%-28s ${(System.nanoTime() - s) / 1e9}%6.2f s")
    }
    time("warmup count")(spark.range(10).count())
    time("range(1e6).count x3") {
      (1 to 3).foreach(_ => spark.range(1000000).count())
    }
    time("small shuffle x3") {
      (1 to 3).foreach(_ =>
        spark.range(100000).groupBy(org.apache.spark.sql.functions
          .pmod(org.apache.spark.sql.functions.col("id"), org.apache.spark.sql.functions.lit(100)))
          .count().collect())
    }
    val sf = args.headOption.getOrElse("/root/testdata/sf0.01")
    time("parquet read region.count") {
      spark.read.parquet(s"$sf/region.parquet").count()
    }
    time("parquet read lineitem.count") {
      spark.read.parquet(s"$sf/lineitem.parquet").count()
    }
    time("localCheckpoint(1e5) x3") {
      (1 to 3).foreach(_ => spark.range(100000).toDF().localCheckpoint(true))
    }
    time("write small parquet x3") {
      (1 to 3).foreach(i => spark.range(1000).write.mode("overwrite")
        .parquet(s"/tmp/envprofile_$i"))
    }
    spark.stop()
  }
}
