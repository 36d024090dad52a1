package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus snapshot diff — the audit primitive behind "what changed
  * between yesterday's corpus and today's?": per doc id, whether it
  * was added, removed, or its content changed (beyond-reference
  * extension; BASELINE north star). Every downstream incremental
  * operator (dedup index, ANN index, curation stages) consumes
  * exactly this delta, and data-governance review wants it as a
  * report.
  *
  * Scale shape: content collapses to a 64-bit fingerprint MAP-SIDE, so
  * the only thing shuffled is (id, 8 bytes) per side — the text
  * column never moves. One full-outer id join decides the status
  * (equal-fingerprint rows drop). Collision odds are the repo's usual
  * 2⁻⁶⁴-per-pair: a collision reads as "unchanged", the same
  * trade every fingerprint dedup here makes.
  */
object CorpusDiff {

  /** (`doc_id`, `status`) for every id whose membership or content
    * differs between `old` and `cur`; `status` ∈ added | removed |
    * changed. Unchanged docs do not appear.
    */
  def diff(old: DataFrame, cur: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    val o = old.select(col(idCol).as("doc_id"),
      xxhash64(col(textCol)).as("__fo"))
    val c = cur.select(col(idCol).as("doc_id"),
      xxhash64(col(textCol)).as("__fc"))
    o.join(c, Seq("doc_id"), "full_outer")
      .withColumn("status",
        when(col("__fo").isNull, "added")
          .when(col("__fc").isNull, "removed")
          .when(col("__fo") =!= col("__fc"), "changed"))
      .filter(col("status").isNotNull)
      .select("doc_id", "status")
  }

  /** Token-distribution drift between two corpus snapshots — the
    * data-quality monitor a training pipeline runs between ingests
    * ("did today's crawl change what the model will read?"): the
    * `topK` tokens by absolute probability shift |p_cur − p_old|,
    * with both sides' counts and probabilities. A pipeline alerts on
    * the report's head (a template token surging, a language marker
    * collapsing) long before an aggregate divergence number moves.
    *
    * Scale shape: one token explode + map-combined (token, count)
    * aggregation per side — the classic word-count, Θ(vocab) after
    * combine, never Θ(corpus) — each side's total rides a 1-row
    * broadcast; one full-outer vocab join (absent → count 0); the
    * top-k is a distributed TakeOrdered on (|Δp| desc, token), never a
    * global window. Probabilities are single IEEE divisions of two
    * longs — per-row, order-independent, bit-replayable by the oracle
    * (no distributed float SUM anywhere: an aggregate KL would sum
    * doubles in shuffle order and could never hash-match DuckDB).
    */
  def tokenDrift(old: DataFrame, cur: DataFrame, textCol: String,
      topK: Int = 20): DataFrame = {
    import graft.Stage.StageOps
    def counts(df: DataFrame, cntName: String) = df
      .select(explode(TextFunctions.tokens(col(textCol))).as("tok"))
      .filter(length(col("tok")) > 0)
      .groupBy("tok").agg(count(lit(1)).as(cntName))
    // the joined vocab feeds BOTH the totals and the report — boundary
    // it so each corpus is token-scanned exactly once (totals re-derived
    // from the Θ(vocab) table; long sums, so exact, and a full-outer
    // join with 0-fill preserves each side's grand total)
    val j = counts(old, "cnt_old")
      .join(counts(cur, "cnt_cur"), Seq("tok"), "full_outer")
      .na.fill(0L, Seq("cnt_old", "cnt_cur"))
      .stageBoundary
    val tot = j.agg(sum("cnt_old").as("__to"), sum("cnt_cur").as("__tc"))
    j.crossJoin(broadcast(tot)) // vocab × 1 — the broadcast is one row
      .select(col("tok"), col("cnt_old"), col("cnt_cur"),
        (col("cnt_old").cast("double") / col("__to").cast("double"))
          .as("p_old"),
        (col("cnt_cur").cast("double") / col("__tc").cast("double"))
          .as("p_cur"))
      .withColumn("abs_shift", abs(col("p_cur") - col("p_old")))
      .orderBy(col("abs_shift").desc, col("tok"))
      .limit(topK)
  }
}
