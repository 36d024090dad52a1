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
}
