package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end corpus curation — the composition the individual operators
  * exist for: quality-gate → exact dedup → near-dedup → annotate. Each
  * stage is one of the verified primitives; the composition stays a
  * DataFrame program, so Catalyst fuses the map-side stages and the only
  * shuffles are the two dedup keys (fingerprint, LSH bands).
  *
  * Keeper policy: a doc drops when an exact duplicate with a smaller id
  * survives the gate, or (near-dedup) when any verified near-duplicate
  * with a smaller id exists — deterministic, order-independent.
  */
object Pipeline {

  /** @param minQuality   quality-score gate in [0,1]
    * @param nearDedup    also drop MinHash-LSH near-duplicates at
    *                     `minJaccard` (exact fingerprint dups always drop)
    */
  def curate(docs: DataFrame, textCol: String, idCol: String,
      minQuality: Double = 0.0,
      nearDedup: Boolean = true, minJaccard: Double = 0.9): DataFrame = {
    // 1. quality gate (map-only)
    val gated = docs.filter(TextFunctions.qualityScore(col(textCol)) >= minQuality)
    // 2. exact dedup: keep the min-id row per fingerprint
    val keepers = gated
      .groupBy(TextFunctions.fingerprint(col(textCol)).as("__fp"))
      .agg(min(col(idCol)).as(idCol))
      .select(idCol)
    val exactDeduped = gated.join(keepers, Seq(idCol), "left_semi")
    // 3. near-dedup: drop the HIGHER id of every verified near-dup pair
    val deduped =
      if (!nearDedup) exactDeduped
      else {
        val doomed = Dedup.minhashLshPairs(exactDeduped, textCol, idCol,
          n = 3, minJaccard = minJaccard)
          .select(col("id_b").as(idCol)).distinct()
        exactDeduped.join(doomed, Seq(idCol), "left_anti")
      }
    // 4. annotations (map-only)
    deduped
      .withColumn("lang_id", TextFunctions.langId(col(textCol)))
      .withColumn("token_cnt", TextFunctions.tokenCount(col(textCol)))
      .withColumn("quality", TextFunctions.qualityScore(col(textCol)))
  }
}
