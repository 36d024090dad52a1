package graft.ext

import graft.Stage.StageOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

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

  /** Per-corpus-doc contamination FRACTION: of the doc's distinct
    * n-grams, the share present anywhere in the benchmark set — the
    * graded signal (0 = clean, 1 = fully contained) threshold
    * policies want where [[overlapHits]]' absolute count treats a
    * tweet and a book the same. Docs too short to carry one n-gram
    * don't appear (they have no gram evidence either way).
    *
    * Scale shape: the benchmark's distinct grams broadcast (eval
    * suites are MBs against the corpus); the corpus is touched in one
    * map pass + one broadcast LEFT join (zero-hit docs keep frac 0
    * without a second pass over the corpus), and the only shuffle is
    * the per-doc count — same envelope as [[overlapHits]].
    */
  def overlapFraction(corpus: DataFrame, bench: DataFrame,
      textCol: String, idCol: String, n: Int): DataFrame = {
    val benchSh = bench
      .select(explode(Dedup.hashedShingles(col(textCol), n)).as("sh"))
      .distinct()
      .withColumn("__hit", lit(1L))
    corpus
      .select(col(idCol).as("doc_id"),
        array_distinct(Dedup.hashedShingles(col(textCol), n)).as("__shs"))
      .filter(size(col("__shs")) > 0)
      .select(col("doc_id"), size(col("__shs")).cast(LongType).as("__total"),
        explode(col("__shs")).as("sh"))
      .join(broadcast(benchSh), Seq("sh"), "left")
      .groupBy("doc_id")
      .agg(max(col("__total")).as("grams"),
        sum(coalesce(col("__hit"), lit(0L))).as("hits"))
      .withColumn("frac", round(col("hits") / col("grams"), 6))
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

  // ---- Bloom-filter decontamination (the fixed-budget scale path) ----
  //
  // [[overlapHits]] joins the corpus against the benchmark's gram rows —
  // right when eval suites are MBs, but a consortium-sized holdout
  // (thousands of benchmarks, every eval answer ever published) can
  // reach billions of grams, and a shuffle join keyed on them costs a
  // corpus-wide exchange. The Bloom path compresses the WHOLE benchmark
  // side into a fixed `mBits`-bit array (default 2²⁰ bits = 128 KB —
  // constant, whatever the benchmark size), built distributed by
  // [[graft.functions.BitsetAgg]]; the corpus probe is then MAP-ONLY:
  // no join, no shuffle on corpus grams, one aggregation per doc.
  // False positives (rate ≈ fill^k per gram) only over-flag — with
  // minHits ≥ 2 a doc needs several false grams at once; false
  // negatives are impossible, which is the direction decontamination
  // must never err in.
  //
  // Hashing is the repo's portable md5 pattern — bit j of gram g lives
  // at (h1 + j·h2) mod mBits with h1/h2 the two 60-bit md5 halves — so
  // an external engine replays membership (including false positives)
  // bit-for-bit. h2 is forced odd to cycle the power-of-two table.

  private def bloomH1(g: Column): Column =
    conv(substring(md5(g), 1, 15), 16, 10).cast(LongType)
  private def bloomH2(g: Column): Column =
    conv(substring(md5(g), 17, 15), 16, 10).cast(LongType)
      .bitwiseOR(lit(1L))

  /** a doc's distinct word n-grams as strings (the md5-hashable form) */
  private def gramCol(textCol: String, n: Int): Column =
    array_distinct(graft.functions.WordNgrams(
      TextFunctions.tokens(col(textCol)), n))

  /** Build the benchmark Bloom bits: one distinct pass over bench
    * grams, k positions each, OR-folded into a `mBits/64`-word array
    * by [[graft.functions.BitsetAgg]] — the driver receives one
    * fixed-size array, never the gram set.
    */
  def benchBloom(bench: DataFrame, textCol: String, n: Int,
      mBits: Int = 1 << 20, k: Int = 5): Array[Long] = {
    require(k >= 1 && k <= 7, "k in [1,7] keeps h1 + j*h2 inside a long")
    bench
      .select(explode(gramCol(textCol, n)).as("__g")).distinct()
      .select(bloomH1(col("__g")).as("__h1"), bloomH2(col("__g")).as("__h2"))
      .select(explode(transform(sequence(lit(0), lit(k - 1)),
        j => (col("__h1") + j.cast(LongType) * col("__h2")) % mBits))
        .as("__p"))
      .select(graft.functions.BitsetAgg(col("__p"), mBits).as("b"))
      .head().getSeq[Long](0).toArray
  }

  /** Per-ROW Bloom hit count: how many of the text's DISTINCT n-grams
    * have all k probe bits set in `bloomBits`. A pure column
    * expression (the bit array rides the plan as a literal; the gram
    * walk is a codegen'd higher-order fold over the row's own array)
    * — NO explode, NO shuffle, NO per-doc aggregation, which is what
    * lets the same gate run unchanged over a STREAMING corpus: a
    * stateless filter needs no micro-batch state at all.
    */
  def bloomHitsCol(textCol: Column, bloomBits: Array[Long],
      n: Int, k: Int = 5): Column = {
    require(k >= 1 && k <= 7, "k in [1,7] keeps h1 + j*h2 inside a long")
    val mBits = bloomBits.length * 64
    val bitsLit = typedlit(bloomBits)
    val grams = array_distinct(graft.functions.WordNgrams(
      TextFunctions.tokens(textCol), n))
    // hash once per gram into a (h1, h2) struct, then probe k bits
    val hashed = transform(grams, g => struct(
      bloomH1(g).as("h1"), bloomH2(g).as("h2")))
    size(filter(hashed, h =>
      forall(sequence(lit(0), lit(k - 1)), j => {
        val p = (h.getField("h1") + j.cast(LongType) * h.getField("h2")) % mBits
        element_at(bitsLit, (p / 64).cast(IntegerType) + 1)
          .bitwiseAND(call_function("shiftleft", lit(1L),
            (p % 64).cast(IntegerType))) =!= lit(0L)
      })))
  }

  /** Per-corpus-doc contamination evidence against the Bloom bits:
    * (`doc_id`, hits) where hits counts the doc's DISTINCT n-grams
    * whose k probe bits are all set; only docs with ≥ minHits appear.
    * Entirely map-side via [[bloomHitsCol]] — no explode, no shuffle
    * (the r6 shape exploded grams and re-aggregated per doc; the
    * per-row fold computes the same count inside one projection).
    */
  def bloomOverlapHits(corpus: DataFrame, bloomBits: Array[Long],
      textCol: String, idCol: String, n: Int,
      k: Int = 5, minHits: Int = 1): DataFrame =
    corpus.select(col(idCol).as("doc_id"),
        bloomHitsCol(col(textCol), bloomBits, n, k).cast(LongType).as("hits"))
      .filter(col("hits") >= minHits)

  // ---- Fuzzy (near-duplicate) decontamination ----
  //
  // The verbatim paths above catch docs that QUOTE the benchmark; a
  // paraphrased or lightly-edited eval answer slips them when fewer than
  // minHits n-grams survive verbatim. The fuzzy path flags corpus docs
  // that are NEAR-DUPLICATES of a benchmark doc as a whole — MinHash-LSH
  // candidate generation across the two corpora, then EXACT n-gram
  // Jaccard verification — the cross-corpus analogue of
  // [[Dedup.minhashLshPairs]], and what Dolma/RefinedWeb-style pipelines
  // run between the training corpus and every eval suite.

  /** Cross-corpus near-duplicate matches: (`doc_id`, `bench_id`,
    * `jaccard`) for every corpus/benchmark pair whose exact n-gram
    * Jaccard ≥ `minJaccard`, candidates generated by joining the two
    * sides' LSH band rows (same signature family and banding as
    * [[Dedup.minhashLshPairs]], so a persisted
    * [[Dedup.writeBandIndex]] corpus index is probe-compatible).
    *
    * Output equals the brute-force cross join whenever banding recall
    * is ~1 at the threshold (numPerms=64, bands=16 → 4 rows/band: a
    * true pair at j=0.9 is missed with prob (1−0.9⁴)¹⁶ ≈ 4e-8).
    *
    * Scale shape: both sides reduce to constant-width (id, band,
    * bandHash) rows — shingle arrays never shuffle. The benchmark side
    * is tiny against a 100 TB corpus (eval suites), so its band rows
    * and verification shingle sets BROADCAST: the corpus is touched in
    * one banding map pass + one broadcast join, never self-joined and
    * never exchanged. Hot corpus duplicates (m copies of one benchmark
    * answer) cost m candidate rows — LINEAR, unlike within-corpus LSH's
    * m² bucket blowup — so the exact-set collapse machinery is
    * deliberately not replicated here. Verification shingles re-derive
    * only for docs in some candidate pair (semi-join first), exactly
    * like [[Dedup]]'s verify stage.
    */
  def fuzzyMatches(corpus: DataFrame, bench: DataFrame,
      textCol: String, idCol: String, n: Int = 3, minJaccard: Double = 0.9,
      numPerms: Int = 64, bands: Int = 16): DataFrame = {
    val cb = Dedup.bandRows(corpus, textCol, idCol, n, numPerms, bands)
    val bb = Dedup.bandRows(bench, textCol, idCol, n, numPerms, bands)
    // materialized once (O(near-dup pairs), small): the final join and
    // BOTH verification semi-joins read the candidate list without
    // re-running the corpus-wide banding pipeline, and its measured
    // stats let the semi-joins broadcast instead of exchanging the
    // corpus (the [[Dedup.selfCandidates]] pattern)
    val cand = cb.as("c")
      .join(broadcast(bb.as("b")),
        col("c.band") === col("b.band") &&
          col("c.bandHash") === col("b.bandHash"))
      .select(col("c.id").as("__ca"), col("b.id").as("__cb"))
      .distinct()
      .stageBoundary
    val corpSh = corpus
      .join(cand.select("__ca").distinct(), corpus(idCol) === col("__ca"),
        "left_semi")
      .select(col(idCol).as("__ca"),
        Dedup.hashedShingles(col(textCol), n).as("__sha"))
      .filter(size(col("__sha")) > 0)
    val benchSh = bench
      .join(cand.select("__cb").distinct(), bench(idCol) === col("__cb"),
        "left_semi")
      .select(col(idCol).as("__cb"),
        Dedup.hashedShingles(col(textCol), n).as("__shb"))
      .filter(size(col("__shb")) > 0)
    cand
      .join(corpSh, "__ca")
      .join(broadcast(benchSh), "__cb")
      .withColumn("__i", size(array_intersect(col("__sha"), col("__shb"))))
      .withColumn("jaccard", col("__i").cast(DoubleType) /
        (size(col("__sha")) + size(col("__shb")) - col("__i"))
          .cast(DoubleType))
      .filter(col("jaccard") >= minJaccard)
      .select(col("__ca").as("doc_id"), col("__cb").as("bench_id"),
        col("jaccard"))
  }

  /** The fuzzily-clean corpus: drops every doc with a
    * [[fuzzyMatches]] hit. One anti-join on the (small) flagged-id set.
    */
  def fuzzyClean(corpus: DataFrame, bench: DataFrame,
      textCol: String, idCol: String, n: Int = 3,
      minJaccard: Double = 0.9): DataFrame = {
    val bad = fuzzyMatches(corpus, bench, textCol, idCol, n, minJaccard)
      .select(col("doc_id").as("__bad_id")).distinct()
    corpus.join(bad, corpus(idCol) === col("__bad_id"), "left_anti")
  }
}
