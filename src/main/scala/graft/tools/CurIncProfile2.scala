package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Stage.StageOps

/** dev scratch: sub-stage timing inside curateV2WriteIndexes and
  * curateV2Incremental (mirrors their bodies step by step).
  */
object CurIncProfile2 {
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
      println(f"[ci2] $tag ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    import graft.ext._
    (1 to 3).foreach { i =>
      val docs = graft.Tables.load(spark, sfDir, "documents")
      val corpus = docs.filter(col("source") =!= "src0")
      val bench = docs.filter(col("source") === "src0")
      val dir = graft.QueryDef.scratchDir("curinc_prof2")
      val hist = corpus.filter(col("doc_id") < 400)
      // --- writeIndexes body ---
      val gated = hist.filter(TextFunctions.gopherKeep(col("text")))
      t(s"run$i w.windows") {
        SubstringDedup.writeWindowIndex(gated, "text", "doc_id", 8,
          s"$dir/windows")
      }
      val cleaned = t(s"run$i w.cleaned+boundary") {
        SubstringDedup.cleanedText(gated, "text", "doc_id", 8)
          .filter(TextFunctions.tokenCount(col("cleaned")) >= 10)
          .stageBoundary
      }
      t(s"run$i w.fingerprints") {
        Dedup.writeFingerprintIndex(cleaned, "cleaned", s"$dir/fingerprints")
      }
      t(s"run$i w.exact_docs") {
        val keepers = cleaned
          .groupBy(TextFunctions.fingerprint(col("cleaned")).as("__fp"))
          .agg(min(col("doc_id")).as("doc_id"))
          .select("doc_id")
        cleaned.join(keepers, Seq("doc_id"), "left_semi")
          .select(col("doc_id"), col("cleaned"))
          .write.mode("overwrite").parquet(s"$dir/exact_docs")
      }
      t(s"run$i w.bands") {
        Dedup.writeBandIndex(spark.read.parquet(s"$dir/exact_docs"),
          "cleaned", "doc_id", s"$dir/bands")
      }
      // --- incremental body ---
      val newDocs = corpus.filter(col("doc_id") >= 400)
      val gated2 = newDocs.filter(TextFunctions.gopherKeep(col("text")))
      val cleaned2 = t(s"run$i i.cleanedInc+boundary") {
        SubstringDedup.cleanedTextIncremental(gated2, s"$dir/windows",
          "text", "doc_id", 8)
          .filter(TextFunctions.tokenCount(col("cleaned")) >= 10)
          .stageBoundary
      }
      val exact = t(s"run$i i.exactInc+boundary") {
        Dedup.exactDedupIncremental(cleaned2, s"$dir/fingerprints",
          "cleaned", "doc_id").stageBoundary
      }
      val doomed = t(s"run$i i.lshDoomedInc") {
        Dedup.minhashLshDoomedIncremental(spark,
          exact.select(col("doc_id"), col("cleaned")),
          spark.read.parquet(s"$dir/exact_docs"), s"$dir/bands",
          "cleaned", "doc_id", n = 3, minJaccard = 0.9,
          historyWins = false)
      }
      val nearDeduped = t(s"run$i i.anti+boundary") {
        exact.join(doomed, Seq("doc_id"), "left_anti").stageBoundary
      }
      val out = t(s"run$i i.decontam+annotate(count)") {
        val dirty = Decontaminate.overlapHits(
          nearDeduped,
          bench.select(col("doc_id"), col("text").as("cleaned")),
          "cleaned", "doc_id", n = 5, minHits = 5)
          .select(col("doc_id").as("__dirty_id"))
        nearDeduped
          .join(dirty, col("doc_id") === col("__dirty_id"), "left_anti")
          .withColumn("lang_id", TextFunctions.langId(col("cleaned")))
          .withColumn("token_cnt", TextFunctions.tokenCount(col("cleaned")))
          .withColumn("quality", TextFunctions.qualityScore(col("cleaned")))
          .orderBy("doc_id").count()
      }
      println(s"[ci2] run$i rows $out")
    }
    spark.stop()
  }
}
