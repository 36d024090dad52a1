package graft.ext

import graft.Stage.StageOps

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

  /** The full modern curation stack, each stage a verified primitive:
    *
    *   1. Gopher composite quality gate (map-only,
    *      [[TextFunctions.gopherKeep]]);
    *   2. exact duplicate-substring removal over the gated corpus
    *      ([[SubstringDedup.cleanedText]], k-token windows) — documents
    *      carry their cleaned text forward;
    *   3. drop documents left with fewer than `minCleanTokens` tokens;
    *   4. exact dedup on the CLEANED text (min-id keeper) — span removal
    *      can make near-copies exactly equal, so this runs after it;
    *   5. MinHash-LSH near-dedup on the cleaned text (higher id of each
    *      verified pair drops);
    *   6. benchmark decontamination against `bench`
    *      ([[Decontaminate.overlapHits]], `decontamN`-gram evidence);
    *   7. annotate (lang, token count, quality of the cleaned text).
    *
    * Shuffle ledger at 100 TB: window-hash key (spans), fingerprint
    * (exact), band keys + candidate verify (LSH), shingle-key broadcast
    * join (decontaminate) — every other stage is a narrow map.
    */
  def curateV2(docs: DataFrame, bench: DataFrame,
      textCol: String, idCol: String,
      k: Int = 8, minJaccard: Double = 0.9,
      decontamN: Int = 5, decontamMinHits: Int = 5,
      minCleanTokens: Int = 10): DataFrame = {
    val gated = docs.filter(TextFunctions.gopherKeep(col(textCol)))
    // STAGE BOUNDARIES: the span-clean subtree (two corpus shuffles + a
    // join) feeds every later stage, and the later stages each scan
    // their input several times (LSH banding + verification, dedup
    // semi/anti joins, decontamination). Materializing the boundary
    // makes each stage's work run ONCE — the in-process analogue of a
    // production pipeline persisting stage outputs between jobs (which
    // a 100 TB run does anyway, for restartability). Without these, the
    // clean pipeline re-executes ~6× (measured 16 s vs 4 s at sf0.1).
    val cleaned = SubstringDedup.cleanedText(gated, textCol, idCol, k)
      .filter(TextFunctions.tokenCount(col("cleaned")) >= minCleanTokens)
      .stageBoundary
    val keepers = cleaned
      .groupBy(TextFunctions.fingerprint(col("cleaned")).as("__fp"))
      .agg(min(col(idCol)).as(idCol))
      .select(idCol)
    val exact = cleaned.join(keepers, Seq(idCol), "left_semi")
      .stageBoundary
    val doomed = Dedup.minhashLshPairs(exact, "cleaned", idCol,
      n = 3, minJaccard = minJaccard)
      .select(col("id_b").as(idCol)).distinct()
    val nearDeduped = exact.join(doomed, Seq(idCol), "left_anti")
      .stageBoundary
    val dirty = Decontaminate.overlapHits(
      nearDeduped,
      bench.select(col(idCol), col(textCol).as("cleaned")),
      "cleaned", idCol, n = decontamN, minHits = decontamMinHits)
      .select(col("doc_id").as("__dirty_id"))
    nearDeduped
      .join(dirty, col(idCol) === col("__dirty_id"), "left_anti")
      .withColumn("lang_id", TextFunctions.langId(col("cleaned")))
      .withColumn("token_cnt", TextFunctions.tokenCount(col("cleaned")))
      .withColumn("quality", TextFunctions.qualityScore(col("cleaned")))
  }
}
