package graft.tools

import graft.graph.TpchGraph
import org.apache.spark.sql.SparkSession
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration

/** dev scratch: graph_build phase split at bench settings — sequential
  * vs concurrent table materialization, then stats/session warm.
  */
object BuildProfile2 {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val par = args.lift(1).exists(_ == "par")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Unit): Unit = {
      val s = System.nanoTime()
      f
      println(f"[build2] $name%-28s ${(System.nanoTime() - s) / 1e9}%6.2f s")
    }
    val tables = TpchGraph.tables(spark, sf)
    time(if (par) "materialize tables (par)" else "materialize tables (seq)") {
      if (par) {
        implicit val ec: ExecutionContext = ExecutionContext.global
        Await.result(
          Future.sequence(tables.values.map(t => Future(t.count()))),
          Duration.Inf)
      } else tables.values.foreach(_.count())
    }
    time("session + sampled stats") {
      graft.queries.SqlQueries.session(spark, sf)
    }
    spark.stop()
  }
}
