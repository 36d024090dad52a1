package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** dev scratch: A/B the single-split serial-scan cost — run a dedup
  * operator on documents as loaded (1 split) vs repartitioned to
  * cores, 3 runs each, same session.
  */
object RepartAb {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def med(tag: String)(f: => Long): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"[ab] $tag median ${ts(1)}%.2f " +
        ts.map(t => f"$t%.2f").mkString("(", " ", ")"))
    }
    val docs0 = graft.Tables.load(spark, sfDir, "documents")
    val docsR = docs0.repartition(spark.sparkContext.defaultParallelism)
    med("lsh 1split") {
      graft.ext.Dedup.minhashLshPairs(docs0, "text", "doc_id",
        n = 3, minJaccard = 0.9, numPerms = 64, bands = 8).count()
    }
    med("lsh repart") {
      graft.ext.Dedup.minhashLshPairs(docsR, "text", "doc_id",
        n = 3, minJaccard = 0.9, numPerms = 64, bands = 8).count()
    }
    med("jaccard 1split") {
      graft.ext.Dedup.ngramJaccardPairs(docs0, "text", "doc_id",
        n = 3, minJaccard = 0.8).count()
    }
    med("jaccard repart") {
      graft.ext.Dedup.ngramJaccardPairs(docsR, "text", "doc_id",
        n = 3, minJaccard = 0.8).count()
    }
    val bench = docs0.filter(col("source") === "src0")
    val corp = docs0.filter(col("source") =!= "src0")
    val benchR = docsR.filter(col("source") === "src0")
    val corpR = docsR.filter(col("source") =!= "src0")
    med("curateV2 1split") {
      graft.ext.Pipeline.curateV2(corp, bench, "text", "doc_id").count()
    }
    med("curateV2 repart") {
      graft.ext.Pipeline.curateV2(corpR, benchR, "text", "doc_id").count()
    }
    spark.stop()
  }
}
