package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** dev scratch: per-job wall times for a query — `JobCount <sfDir>
  * <name>` runs it twice (warm JIT) and prints the second run's job
  * timeline (id, seconds, first stage name). Latency-bound rows at
  * small sf are job-count problems, not data problems; this shows
  * which jobs carry the time.
  */
object JobCount {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val lines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        starts.put(j.jobId, (j.time,
          j.stageInfos.headOption.map(_.name.take(70)).getOrElse("?")))
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        val (t0, n) = starts.getOrDefault(j.jobId, (j.time, "?"))
        lines.add(f"job ${j.jobId}%3d ${(j.time - t0) / 1e3}%6.2f s  $n")
      }
    })
    (1 to 2).foreach { i =>
      lines.clear()
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      Thread.sleep(400)
      println(f"[jobcount] $name run$i $dt%.2f s jobs=${lines.size}")
      if (i == 2) lines.forEach(l => println(s"[jobcount]   $l"))
    }
    spark.stop()
  }
}
