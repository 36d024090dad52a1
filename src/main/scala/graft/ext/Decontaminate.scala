package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination for training-data pipelines — remove (or
  * flag) corpus documents that share verbatim n-gram content with an
  * evaluation/benchmark set, so eval answers don't leak into training
  * data (beyond-reference extension; BASELINE north star).
  *
  * Scale shape: both sides reduce to (id, 64-bit shingle hash) rows via
  * the native [[graft.functions.ShingleHashes]] pass; the only shuffle
  * is the shingle-key join, and the benchmark side is tiny relative to
  * the corpus (eval suites are MBs against a 100 TB corpus), so AQE
  * broadcasts it — the corpus is touched in ONE map + ONE broadcast-join
  * pass, never self-joined. A hot-shingle cap on the *benchmark* side
  * (stop-phrase n-grams) bounds per-key fan-out exactly like
  * [[Dedup.ngramJaccardPairs]].
  */
object Decontaminate {

  /** Per-corpus-doc contamination evidence: the number of DISTINCT
    * benchmark n-grams the doc contains, and the number of distinct
    * benchmark docs it overlaps. Only docs with ≥ minHits shared
    * n-grams appear.
    */
  def overlapHits(corpus: DataFrame, bench: DataFrame,
      textCol: String, idCol: String, n: Int,
      minHits: Int = 1,
      maxBenchShingleFreq: Option[Int] = None): DataFrame = {
    def sh(df: DataFrame) = df.select(col(idCol).as("id"),
      explode(Dedup.hashedShingles(col(textCol), n)).as("sh"))
    var benchSh = sh(bench)
    maxBenchShingleFreq.foreach { cap =>
      val w = org.apache.spark.sql.expressions.Window.partitionBy("sh")
      benchSh = benchSh.withColumn("__f", count(lit(1)).over(w))
        .filter(col("__f") <= cap).drop("__f")
    }
    sh(corpus).as("c")
      .join(benchSh.as("b"), col("c.sh") === col("b.sh"))
      .groupBy(col("c.id").as("doc_id"))
      .agg(countDistinct(col("c.sh")).as("hits"),
        countDistinct(col("b.id")).as("bench_docs"))
      .filter(col("hits") >= minHits)
  }

  /** The clean corpus: drops every doc flagged by [[overlapHits]].
    * One anti-join on the (small) contaminated-id set.
    */
  def clean(corpus: DataFrame, bench: DataFrame,
      textCol: String, idCol: String, n: Int, minHits: Int): DataFrame = {
    val bad = overlapHits(corpus, bench, textCol, idCol, n, minHits)
      .select(col("doc_id").as("__bad_id"))
    corpus.join(bad, corpus(idCol) === col("__bad_id"), "left_anti")
  }
}
