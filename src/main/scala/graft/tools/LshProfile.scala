package graft.tools

import graft.ext.{Dedup, TextFunctions}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** dev scratch: stage timings for minhashLshPairs at a given sfDir */
object LshProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = spark.read.parquet(s"${args(0)}/documents.parquet")
    def t[A](label: String)(f: => A): A = {
      val s = System.nanoTime(); val r = f
      println(f"[lsh] $label ${(System.nanoTime() - s) / 1e9}%.2f s"); r
    }
    val shingled = df.select(col("doc_id").as("id"),
      array_distinct(TextFunctions.shingles(col("text"), 5)).as("shs"))
      .filter(size(col("shs")) > 0)
    t("shingle+count")(shingled.count())
    val sig = shingled.withColumn("sig", Dedup.minhashSignature(col("shs"), 64))
    t("sig+count")(sig.select("id", "sig").count())
    val banded = sig.select(col("id"),
      posexplode(transform(sequence(lit(0), lit(15)),
        b => xxhash64(concat_ws(",", slice(col("sig"), b * 4 + 1, lit(4)))))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bandHash")
    t("banded count")(banded.count())
    val cands = banded.as("a").join(banded.as("b"),
      col("a.band") === col("b.band") && col("a.bandHash") === col("b.bandHash") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b")).distinct()
    val c = t("cand join+checkpoint")(cands.localCheckpoint(true))
    println("cands=" + c.count())
    t("full minhashLshPairs")(
      Dedup.minhashLshPairs(df, "text", "doc_id", 5, 0.9).count())
    spark.stop()
  }
}
