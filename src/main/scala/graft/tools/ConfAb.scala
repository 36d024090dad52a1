package graft.tools

import org.apache.spark.sql.SparkSession

/** dev scratch: A/B a session-conf set over a query list — fresh
  * bench-shaped session per variant (confs are plan-time), medians of
  * 3 per query, same JVM (variant order alternated to split JIT).
  * Usage: ConfAb <sfDir> <q,q,...> [k=v,k=v,...]
  */
object ConfAb {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val confs = if (args.length > 2)
      args(2).split(",").map { kv =>
        val Array(k, v) = kv.split("=", 2); (k, v)
      }.toSeq else Seq.empty
    def session(withConfs: Boolean): SparkSession = {
      val b = SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
      val s = b.getOrCreate()
      confs.foreach { case (k, v) =>
        if (withConfs) s.conf.set(k, v) else s.conf.unset(k)
      }
      s
    }
    // interleave variants so JIT warmth splits evenly: A B A B A B
    val results = scala.collection.mutable.Map[(String, Boolean),
      List[Double]]().withDefaultValue(Nil)
    for (round <- 1 to 3; on <- Seq(false, true)) {
      val spark = session(on)
      spark.sparkContext.setLogLevel("WARN")
      names.foreach { n =>
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(n)(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        results((n, on)) = dt :: results((n, on))
      }
      val _ = round
    }
    names.foreach { n =>
      val off = results((n, false)).sorted.apply(1)
      val on = results((n, true)).sorted.apply(1)
      println(f"[confab] $n%-32s off $off%6.2f  on $on%6.2f  " +
        f"(${(off - on) / off * 100}%+.0f%%)")
    }
  }
}
