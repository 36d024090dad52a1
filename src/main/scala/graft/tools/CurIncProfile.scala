package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** dev scratch: phase timing of q_pipeline_curate_incremental — index
  * build vs incremental probe vs final count, 3 repetitions, bench
  * session shape.
  */
object CurIncProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[curinc] $tag ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    (1 to 3).foreach { i =>
      val docs = graft.Tables.load(spark, sfDir, "documents")
      val corpus = docs.filter(col("source") =!= "src0")
      val bench = docs.filter(col("source") === "src0")
      val dir = graft.QueryDef.scratchDir("curinc_prof")
      t(s"run$i writeIndexes") {
        graft.ext.Pipeline.curateV2WriteIndexes(
          corpus.filter(col("doc_id") < 400), "text", "doc_id", dir)
      }
      val inc = t(s"run$i incremental-build") {
        graft.ext.Pipeline.curateV2Incremental(
          corpus.filter(col("doc_id") >= 400), bench, "text", "doc_id", dir)
          .select(col("doc_id"), col("cleaned"), col("lang_id"),
            col("token_cnt"), col("quality"))
          .orderBy("doc_id")
      }
      t(s"run$i count") { inc.count() }
    }
    spark.stop()
  }
}
