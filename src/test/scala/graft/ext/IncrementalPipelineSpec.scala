package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end incremental curation: `curateV2Incremental` over the
  * persisted index family must equal the batch `curateV2` over
  * history ∪ increment restricted to increment ids — including across
  * TWO consecutive increments with index maintenance in between
  * (`curateV2AppendIndexes`).
  *
  * Two window regimes split the stage coverage: with k larger than any
  * doc the span stage is inert, so exact/LSH/decontamination fire
  * cross-split; with k=8 the span stage dominates (long duplicated
  * chunks are removed before the later dedups see them — the
  * composition's real behavior on copy-heavy corpora).
  */
class IncrementalPipelineSpec extends SparkSpec {

  // an id-unique token every ≤5 positions → no 8-token window repeats
  // across distinct docs unless engineered below; 50 tokens, gate-clean
  private def body(i: Int): String = {
    val fill = Seq("the", "quiet", "study", "of", "corpus", "language",
      "models", "enjoy", "clean", "and", "varied", "text", "because",
      "quality", "gates", "check", "for", "stopwords", "and", "mean",
      "lengths", "while", "duplicate", "ngrams", "must", "stay", "rare",
      "so", "each", "sentence", "here", "differs", "slightly", "with",
      "unique", "tails", "that", "keep", "windows", "apart")
    fill.grouped(4).zipWithIndex
      .flatMap { case (g, j) => g :+ s"u${i}x$j" }.mkString(" ")
  }

  private val contamPhrase =
    "benchmark evaluation questions about arithmetic reasoning held out"

  private def mkDocs(rows: Seq[(Long, String)]): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text")
  }

  private lazy val bench = mkDocs(Seq(
    900L -> (contamPhrase + " with answers attached")))

  private def curatedCols(df: DataFrame) =
    df.select("doc_id", "cleaned", "lang_id", "token_cnt", "quality")
      .collect()
      .map(r => r.getLong(0) ->
        (r.getString(1), r.getString(2), r.getInt(3), r.getDouble(4)))
      .toMap

  private def runBoth(all: DataFrame, k: Int, minJaccard: Double)
      : (Map[Long, Any], Map[Long, Any], Map[Long, Any]) = {
    val batch = curatedCols(Pipeline.curateV2(all, bench, "text", "doc_id",
      k = k, minJaccard = minJaccard, minCleanTokens = 5))
    val dir = java.nio.file.Files.createTempDirectory("curate-idx").toString
    Pipeline.curateV2WriteIndexes(all.filter(col("doc_id") < 31),
      "text", "doc_id", dir, k = k, minCleanTokens = 5)
    val r1 = curatedCols(Pipeline.curateV2Incremental(
      all.filter(col("doc_id").between(31, 45)), bench, "text", "doc_id",
      dir, k = k, minJaccard = minJaccard, minCleanTokens = 5))
    assert(r1 == batch.view.filterKeys(id => id >= 31 && id <= 45).toMap,
      s"batch ↾ inc1 mismatch (k=$k)")
    Pipeline.curateV2AppendIndexes(
      all.filter(col("doc_id").between(31, 45)), "text", "doc_id", dir,
      k = k, minCleanTokens = 5)
    val r2 = curatedCols(Pipeline.curateV2Incremental(
      all.filter(col("doc_id") >= 46), bench, "text", "doc_id",
      dir, k = k, minJaccard = minJaccard, minCleanTokens = 5))
    assert(r2 == batch.view.filterKeys(_ >= 46).toMap,
      s"batch ↾ inc2 mismatch (k=$k)")
    (batch.asInstanceOf[Map[Long, Any]], r1.asInstanceOf[Map[Long, Any]],
      r2.asInstanceOf[Map[Long, Any]])
  }

  test("span stage inert (k > doc length): exact/LSH/decontam fire cross-split") {
    val all = mkDocs(
      (1L to 29L).map(i => i -> body(i.toInt)) ++ Seq[(Long, String)](
        35L -> body(5), // exact dup of history
        36L -> body(6).split(" ").zipWithIndex // 2 edits → jaccard ~0.78
          .map { case (w, j) => if (j == 12 || j == 37) s"swp$j" else w }
          .mkString(" "),
        38L -> (body(38) + " " + contamPhrase + " " + contamPhrase),
        39L -> "too short to pass any gate",
        40L -> body(40), 41L -> body(41), 42L -> body(42),
        // identical within-increment pair: min-id keeper
        44L -> body(44), 45L -> body(44)) ++ Seq[(Long, String)](
        47L -> body(5), // exact dup of history, second increment
        48L -> body(40), // exact dup of an inc1 doc → appended index
        49L -> body(49), 50L -> body(50)))
    val (_, r1, r2) = runBoth(all, k = 60, minJaccard = 0.7)
    assert(!r1.contains(35L), "exact dup of history must drop")
    assert(!r1.contains(36L), "near-dup of history must drop via the band index")
    assert(!r1.contains(38L), "contaminated doc must drop")
    assert(!r1.contains(39L), "gate-failing doc must drop")
    assert(r1.contains(44L) && !r1.contains(45L),
      "within-increment exact pair keeps the min id")
    assert(!r2.contains(47L), "exact dup of history drops in batch 2")
    assert(!r2.contains(48L),
      "exact dup of an inc1 doc drops via the APPENDED fingerprint index")
    assert(r2.contains(49L) && r2.contains(50L))
  }

  test("span stage active (k=8): copied chunks are span-removed before dedup") {
    val all = mkDocs(
      (1L to 29L).map(i => i -> body(i.toInt)) ++ Seq[(Long, String)](
        35L -> body(5), // fully span-removed against history → drops
        // copies doc 7 verbatim + its own unique tail: tail survives
        37L -> (body(7) + " " + (0 until 14).map(j => s"tail37x$j the of")
          .mkString(" ")),
        40L -> body(40), 41L -> body(41)) ++ Seq[(Long, String)](
        46L -> body(46),
        57L -> body(40))) // span-removed against the APPENDED window index
    val (_, r1, r2) = runBoth(all, k = 8, minJaccard = 0.9)
    assert(!r1.contains(35L),
      "an exact copy of history is fully span-removed → dropped")
    assert(r1.contains(37L), "span-cleaned doc keeps its unique tail")
    assert(!r1(37L).asInstanceOf[(String, String, Int, Double)]._1
      .contains("quiet"), "doc 37's copied prefix must be span-removed")
    assert(!r2.contains(57L),
      "a copy of an inc1 doc is span-removed via the appended window index")
    assert(r2.contains(46L))
  }
}
