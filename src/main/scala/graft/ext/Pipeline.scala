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
        // doomed-set primitive, not the pair list: identical anti-join
        // result (proof at Dedup.minhashLshDoomed) without materializing
        // the Θ(m²) pairs a duplicate-heavy corpus implies
        val doomed = Dedup.minhashLshDoomed(exactDeduped, textCol, idCol,
          n = 3, minJaccard = minJaccard)
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
    val doomed = Dedup.minhashLshDoomed(exact, "cleaned", idCol,
      n = 3, minJaccard = minJaccard)
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

  // ---- incremental curation: the four per-operator incremental indexes
  // composed into one daily-ingest pipeline. CONTRACT (shared with every
  // per-op incremental face): history ids < increment ids (ingest
  // order), so history keepers never change and
  //   curateV2Incremental(inc)  ≡  curateV2(history ∪ inc) ↾ inc-ids
  // (IncrementalPipelineSpec proves it property-style; the
  // q_pipeline_curate_incremental oracle replays it byte-for-byte).

  /** Persist the index family [[curateV2Incremental]] probes, from the
    * history corpus:
    *
    *   - `windows/`   distinct k-token window hashes of the GATED raw
    *     text (8 B each) — the substring-dedup face;
    *   - `fingerprints/` content fingerprints of the span-cleaned docs
    *     (16 B per distinct doc) — the exact-dedup face;
    *   - `bands/`     MinHash band index of the exact-dedup survivors
    *     (~20 B × bands per doc), band-partitioned — the near-dup face;
    *   - `exact_docs/` (id, cleaned) of the exact survivors — the
    *     verification text LSH candidates re-shingle against (the one
    *     non-constant-size artifact: it IS the curated corpus a
    *     production pipeline persists anyway).
    *
    * Each index derives from the same intermediate stage the batch
    * pipeline computes — nothing here re-reads history afterwards.
    */
  def curateV2WriteIndexes(docs: DataFrame, textCol: String, idCol: String,
      dir: String, k: Int = 8, minCleanTokens: Int = 10): Unit = {
    val spark = docs.sparkSession
    val gated = docs.filter(TextFunctions.gopherKeep(col(textCol)))
    // the window index derives from the GATED RAW text and nothing
    // downstream of it — overlap its build with the span-clean chain
    // (guide §2.6: independent actions submitted concurrently back-fill
    // each other's stragglers; job descriptions are thread-local, so
    // the overlap never mislabels the enclosing query's jobs)
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    implicit val ec: ExecutionContext = ExecutionContext.global
    val windowsF = Future {
      SubstringDedup.writeWindowIndex(gated, textCol, idCol, k,
        s"$dir/windows")
    }
    val cleaned = SubstringDedup.cleanedText(gated, textCol, idCol, k)
      .filter(TextFunctions.tokenCount(col("cleaned")) >= minCleanTokens)
      .stageBoundary
    // the fingerprint index reads only the MATERIALIZED boundary, as
    // does the exact_docs chain — two more independent actions, same
    // §2.6 overlap as the window index above
    val fpF = Future {
      Dedup.writeFingerprintIndex(cleaned, "cleaned", s"$dir/fingerprints")
    }
    val keepers = cleaned
      .groupBy(TextFunctions.fingerprint(col("cleaned")).as("__fp"))
      .agg(min(col(idCol)).as(idCol))
      .select(idCol)
    // the exact survivors feed BOTH remaining indexes — materialize
    // them once, then the exact_docs write and the band build are
    // independent actions over the same checkpointed rows (the band
    // index no longer waits for, or re-reads, the parquet)
    val exact = cleaned.join(keepers, Seq(idCol), "left_semi")
      .select(col(idCol), col("cleaned"))
      .stageBoundary
    val exactF = Future {
      exact.write.mode("overwrite").parquet(s"$dir/exact_docs")
    }
    // every concurrent write is JOINED before this method exits, even
    // when the inline band build throws (r15 ADVICE: a detached write
    // could leave the index family partially written with its failure
    // swallowed and nothing naming which index broke). The first
    // failure — band build or any future — is the one surfaced.
    var primary: Throwable = null
    try Dedup.writeBandIndex(exact, "cleaned", idCol, s"$dir/bands")
    catch { case t: Throwable => primary = t }
    Seq(windowsF, fpF, exactF).foreach { f =>
      try Await.result(f, Duration.Inf)
      catch { case t: Throwable => if (primary == null) primary = t }
    }
    if (primary != null) throw primary
  }

  /** Curate an ingestion increment against a [[curateV2WriteIndexes]]
    * index family: result rows are exactly the increment's rows of the
    * batch `curateV2` over history ∪ increment — without re-reading
    * history text anywhere except for the LSH candidates' verification
    * (a semi-join on candidate ids against `exact_docs`).
    *
    * Stage ledger: gate (map) → span-clean vs the window index (one
    * 8-byte-key join) → exact vs the fingerprint index (one 16-byte-key
    * anti-join) → LSH vs the band-partitioned index (pruned band join +
    * candidate-only re-shingling) → decontaminate (broadcast) →
    * annotate (map). Work scales with the increment + index sizes,
    * never with history's text.
    */
  def curateV2Incremental(newDocs: DataFrame, bench: DataFrame,
      textCol: String, idCol: String, dir: String,
      k: Int = 8, minJaccard: Double = 0.9,
      decontamN: Int = 5, decontamMinHits: Int = 5,
      minCleanTokens: Int = 10): DataFrame = {
    val spark = newDocs.sparkSession
    val gated = newDocs.filter(TextFunctions.gopherKeep(col(textCol)))
    val cleaned = SubstringDedup
      .cleanedTextIncremental(gated, s"$dir/windows", textCol, idCol, k)
      .filter(TextFunctions.tokenCount(col("cleaned")) >= minCleanTokens)
      .stageBoundary
    val exact = Dedup.exactDedupIncremental(
      cleaned, s"$dir/fingerprints", "cleaned", idCol)
      .stageBoundary
    // larger-id greedy drop (the batch contract's pairs.id_b), resolved
    // at rep granularity — doomed history ids were no-ops in the
    // anti-join, so the increment-only doomed set is the same filter
    val doomed = Dedup.minhashLshDoomedIncremental(spark,
      exact.select(col(idCol), col("cleaned")),
      spark.read.parquet(s"$dir/exact_docs"), s"$dir/bands",
      "cleaned", idCol, n = 3, minJaccard = minJaccard,
      historyWins = false)
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

  /** Fold a processed increment into the index family so the NEXT
    * increment dedups against history ∪ this one — the index-maintenance
    * half of the daily-ingest loop. Appends are per-index parquet
    * appends (duplicate fingerprints/windows are harmless to the
    * semi/anti-join probes).
    *
    * @param appendTo  when set, append output lands under
    *   `appendTo(subdir)` instead of `dir/subdir` while the probes keep
    *   reading `dir` — the staging hook the replay-idempotent streaming
    *   face uses ([[graft.streaming.BatchLedger]] publishes the staged
    *   files into the live index under a batch-provenance prefix)
    */
  def curateV2AppendIndexes(newDocs: DataFrame, textCol: String,
      idCol: String, dir: String, k: Int = 8,
      minCleanTokens: Int = 10,
      appendTo: String => String = null): Unit = {
    val out: String => String =
      if (appendTo == null) sub => s"$dir/$sub" else appendTo
    val gated = newDocs.filter(TextFunctions.gopherKeep(col(textCol)))
    // probe the PRE-append indexes first (stage boundaries are eager, so
    // `cleaned`/`exact` materialize before any append below lands — an
    // increment must never see its own windows/fingerprints as history)
    val cleaned = SubstringDedup
      .cleanedTextIncremental(gated, s"$dir/windows", textCol, idCol, k)
      .filter(TextFunctions.tokenCount(col("cleaned")) >= minCleanTokens)
      .stageBoundary
    val exact = Dedup.exactDedupIncremental(
      cleaned, s"$dir/fingerprints", "cleaned", idCol)
      .stageBoundary
    SubstringDedup.appendWindowIndex(gated, textCol, idCol, k,
      out("windows"))
    cleaned.select(TextFunctions.fingerprint(col("cleaned")).as("fp"))
      .distinct().write.mode("append").parquet(out("fingerprints"))
    exact.select(col(idCol), col("cleaned"))
      .write.mode("append").parquet(out("exact_docs"))
    Dedup.appendBandIndex(exact.select(col(idCol), col("cleaned")),
      "cleaned", idCol, out("bands"))
  }

  /** Leakage-safe train/validation/test split: every member of a
    * near-duplicate cluster lands in its CANONICAL's split, so a
    * training doc can never have a near-copy sitting in validation or
    * test — the standard train/test-leakage guard a naive per-doc hash
    * split silently violates (a 0.95-jaccard pair splits apart with
    * probability ≈ 1 − Σ pᵢ²).
    *
    * Shape: the guard costs exactly the near-dup clustering — the
    * collapsed cluster-edge graph ([[Dedup.ngramJaccardClusterEdges]],
    * O(duplicates) edges, never member-pair cliques) closed by
    * [[Dedup.resolveClusters]]; the split itself is a map-side hash of
    * the canonical id (portable md5 reduction, replayable by the
    * oracle), no shuffle beyond the closure. Singletons (the ~entire
    * corpus) hash their own id — identical to the naive split wherever
    * no near-dup exists.
    *
    * Returns (`idCol`, canonical, bucket, split) with buckets in
    * [0, 100): [0, trainPct) → train, [trainPct, trainPct+valPct) →
    * validation, rest → test.
    */
  def leakageSafeSplit(docs: DataFrame, textCol: String, idCol: String,
      n: Int = 3, minJaccard: Double = 0.8,
      trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct < 100,
      s"split percentages must partition [0,100): train=$trainPct val=$valPct")
    val edges = Dedup.ngramJaccardClusterEdges(docs, textCol, idCol,
      n, minJaccard)
    val clusters = Dedup.resolveClusters(edges, docs, idCol)
    val bucket = conv(substring(
      md5(concat(lit("split:"), col("canonical").cast("string"))), 1, 15),
      16, 10).cast("long") % 100
    clusters.select(col(idCol), col("canonical"),
      bucket.cast("int").as("bucket"),
      when(bucket < trainPct, "train")
        .when(bucket < trainPct + valPct, "validation")
        .otherwise("test").as("split"))
  }
}
