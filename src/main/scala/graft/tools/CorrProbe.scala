package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageSubmitted}
import org.apache.spark.sql.SparkSession

/** dev scratch: replicate the Bench session shape (JVM prewarm → graph
  * build + staging release → named query) while printing every submitted
  * stage's id + name, so a TaskSetManager "task of very large size"
  * WARN — which names only a stage id — lands next to the stage that
  * carries it. The r13 harness for the once-per-cold-bench 1174 KiB
  * WARN the stage map pinned to the q_sql_correlated window.
  *
  * Usage: runMain graft.tools.CorrProbe <sfDir> <query[,query...]> [runs]
  */
object CorrProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val runs = if (args.length > 2) args(2).toInt else 1
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageSubmitted(s: SparkListenerStageSubmitted): Unit = {
        val i = s.stageInfo
        println(s"[stage] ${i.stageId} tasks=${i.numTasks} ${i.name}")
        Console.out.flush()
      }
    })
    // Bench's prewarm (JIT + parquet init)
    locally {
      val tmp = java.nio.file.Files.createTempDirectory("corrprobe_warm")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("k").orderBy("id")
      import org.apache.spark.sql.functions._
      spark.range(1 << 18)
        .select(col("id"), pmod(col("id"), lit(64)).as("k"))
        .withColumn("r", row_number().over(w))
        .groupBy("k")
        .agg(sum("id"), sort_array(collect_list(struct(col("r"), col("id")))))
        .write.mode("overwrite").parquet(tmp.toString)
      spark.read.parquet(tmp.toString).count()
    }
    println("[probe] === graph build ===")
    locally {
      import scala.concurrent.{Await, ExecutionContext, Future}
      import scala.concurrent.duration.Duration
      implicit val ec: ExecutionContext = ExecutionContext.global
      Await.result(
        Future.traverse(graft.graph.TpchGraph.tables(spark, sfDir).values.toSeq)(
          t => Future(t.count())),
        Duration.Inf)
      graft.queries.SqlQueries.session(spark, sfDir)
    }
    graft.graph.TpchGraph.releaseStaging(sfDir)
    // INFO just for the query loop: TaskSetManager logs every task's
    // serialized size at INFO, which is the ground truth the WARN
    // thresholds at 1000 KiB
    if (sys.env.contains("CORRPROBE_INFO"))
      spark.sparkContext.setLogLevel("INFO")
    names.foreach { name =>
      (1 to runs).foreach { r =>
        println(s"[probe] === $name run $r ===")
        val n = graft.SparkEntry.queries(name)(spark, sfDir).count()
        println(s"[probe] === $name run $r done rows=$n ===")
      }
    }
    spark.stop()
  }
}
