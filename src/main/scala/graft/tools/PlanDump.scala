package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Dump formatted physical plans for named queries — the `.explain`
  * iteration loop: check PushedFilters reach the parquet scans, small
  * dimensions broadcast, and WholeStageCodegen spans stay wide.
  *
  * Usage: runMain graft.tools.PlanDump <sfDir> <queryName> [queryName...]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.tail.foreach { name =>
      println(s"========== $name ==========")
      SparkEntry.defs(name).run(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
