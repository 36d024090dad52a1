package graft.tools

import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** dev scratch: stage timings of editDistancePairs at sf0.1 */
object EdProfile {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](name: String)(f: => T): T = {
      val s = System.nanoTime()
      val r = f
      println(f"[ed] $name%-30s ${(System.nanoTime() - s) / 1e9}%6.2f s")
      r
    }
    val docs = Tables.load(spark, sf, "documents").select("doc_id", "text")
    val u = docs.union(docs.filter(col("doc_id") % 5 === 0)
      .select((col("doc_id") + 10000).as("doc_id"),
        concat(col("text"), lit(" x")).as("text"))).localCheckpoint(true)
    println(s"[ed] docs: ${u.count()}")
    println(s"[ed] avg len: " +
      u.select(avg(length(col("text")))).head().getDouble(0))
    val q = 5; val maxDist = 3
    val prefLen = q * maxDist + 1
    val shortMax = q * (maxDist + 1) - 1
    val base = u.filter(col("text").isNotNull)
      .select(col("doc_id").as("id"), col("text").as("t"),
        length(col("text")).as("len"))
    val prefix = time("prefix build") {
      base.filter(col("len") > shortMax)
        .select(col("id"), col("len"),
          expr(("array_sort(array_distinct(transform(" +
            s"sequence(1, len - ${q - 1}), " +
            s"i -> xxhash64(substring(t, i, $q)))))")).as("__hs"))
        .select(col("id"), col("len"), explode(expr(
          s"filter(__hs, h -> h <= element_at(__hs, " +
            s"least(size(__hs), $prefLen)))")).as("g"))
        .localCheckpoint(true)
    }
    println(s"[ed] prefix rows: ${prefix.count()}")
    val p = prefix.withColumn("b",
      (col("len") / (maxDist + 1)).cast("long"))
    val cand = time("candidate join + distinct") {
      val candSame = p.as("a").join(p.as("b"),
        col("a.g") === col("b.g") && col("a.b") === col("b.b") &&
          col("a.id") < col("b.id") &&
          abs(col("a.len") - col("b.len")) <= maxDist)
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      val candAdj = p.as("a").join(p.as("b"),
        col("a.g") === col("b.g") && col("a.b") + 1 === col("b.b") &&
          abs(col("a.len") - col("b.len")) <= maxDist)
        .select(least(col("a.id"), col("b.id")).as("id_a"),
          greatest(col("a.id"), col("b.id")).as("id_b"))
      candSame.unionByName(candAdj).distinct().localCheckpoint(true)
    }
    println(s"[ed] candidates: ${cand.count()}")
    val texts = base.select(col("id"), col("t"))
    val out = time("verify levenshtein") {
      cand
        .join(texts.select(col("id").as("id_a"), col("t").as("t_a")), "id_a")
        .join(texts.select(col("id").as("id_b"), col("t").as("t_b")), "id_b")
        .withColumn("dist", levenshtein(col("t_a"), col("t_b"), maxDist))
        .filter(col("dist") >= 0)
        .select("id_a", "id_b", "dist").localCheckpoint(true)
    }
    println(s"[ed] pairs: ${out.count()}")
    spark.stop()
  }
}
