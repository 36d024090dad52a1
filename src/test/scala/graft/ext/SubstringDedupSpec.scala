package graft.ext

import graft.SparkSpec

class SubstringDedupSpec extends SparkSpec {

  // doc 1 is the canonical source; doc 2 embeds a 4-token span of it;
  // doc 3 repeats its own 3-token phrase; doc 4 is a verbatim copy of 1
  private def docs = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, "a b c d e f"),
      (2L, "x a b c d y"),
      (3L, "p q r p q r p q"),
      (4L, "a b c d e f")
    ).toDF("doc_id", "text")
  }

  test("duplicated windows mark all but the first (doc, pos) occurrence " +
    "and merge into maximal spans") {
    val spans = SubstringDedup.duplicatedSpans(docs, "text", "doc_id", k = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    // doc 1 holds every canonical occurrence → no spans; doc 2's shared
    // windows start at 1,2 → [1,5); doc 3's self-repeat starts 3,4,5 →
    // [3,8); doc 4 duplicates doc 1 wholesale → [0,6)
    assert(spans == Set((2L, 1, 5), (3L, 3, 8), (4L, 0, 6)))
  }

  test("cleanedText removes exactly the spanned tokens, keeps clean docs, " +
    "and empties full copies") {
    val cleaned = SubstringDedup.cleanedText(docs, "text", "doc_id", k = 3)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(cleaned == Map(
      1L -> "a b c d e f",
      2L -> "x y",
      3L -> "p q r",
      4L -> ""))
  }

  test("incremental spans against a window index match the full-corpus " +
    "result when history holds the canonicals") {
    val s = spark
    import s.implicits._
    val hist = docs // ids 1..4
    val inc = Seq(
      (10L, "w a b c d z"),        // interior windows hit doc 1 via index
      (11L, "m n o m n o m n"),    // self-repeat within the increment
      (12L, "fresh unseen tokens entirely")
    ).toDF("doc_id", "text")
    val idx = java.nio.file.Files
      .createTempDirectory("win_idx_spec").toString
    SubstringDedup.writeWindowIndex(hist, "text", "doc_id", k = 3, idx)
    val got = SubstringDedup
      .duplicatedSpansIncremental(inc, idx, "text", "doc_id", k = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    // equivalently: full-corpus spans restricted to the increment (all
    // increment ids exceed history ids, so canonicals sit in history)
    val full = SubstringDedup
      .duplicatedSpans(hist.unionByName(inc), "text", "doc_id", k = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
      .filter(_._1 >= 10L)
    assert(got == full)
    assert(got == Set((10L, 1, 5), (11L, 3, 8)))
    // the clean face removes exactly those tokens
    val cleaned = SubstringDedup
      .cleanedTextIncremental(inc, idx, "text", "doc_id", k = 3)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(cleaned == Map(10L -> "w z", 11L -> "m n o",
      12L -> "fresh unseen tokens entirely"))
  }

  test("duplicate hashes in the window index leave incremental spans and " +
    "cleaned text unchanged (r15 ADVICE pin)") {
    // appendWindowIndex dedupes only within each increment, so an index
    // can legitimately carry the same hash twice; incrementalStarts'
    // left join then emits duplicate (id, pos) rows — harmless ONLY
    // because mergedSpans' sorted cover-merge is idempotent in repeated
    // positions. This pin makes that invariant a test, not a comment.
    val s = spark
    import s.implicits._
    val hist = docs // ids 1..4
    val inc = Seq(
      (10L, "w a b c d z"),
      (11L, "m n o m n o m n")
    ).toDF("doc_id", "text")
    val idx = java.nio.file.Files
      .createTempDirectory("win_idx_dup_spec").toString
    SubstringDedup.writeWindowIndex(hist, "text", "doc_id", k = 3, idx)
    // re-append the SAME history: every hash now appears twice
    SubstringDedup.appendWindowIndex(hist, "text", "doc_id", k = 3, idx)
    val got = SubstringDedup
      .duplicatedSpansIncremental(inc, idx, "text", "doc_id", k = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    assert(got == Set((10L, 1, 5), (11L, 3, 8)))
    val cleaned = SubstringDedup
      .cleanedTextIncremental(inc, idx, "text", "doc_id", k = 3)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(cleaned == Map(10L -> "w z", 11L -> "m n o"))
  }

  test("a window shorter than k produces no occurrences") {
    val s = spark
    import s.implicits._
    val tiny = Seq((1L, "a b"), (2L, "a b")).toDF("doc_id", "text")
    assert(SubstringDedup.duplicatedSpans(tiny, "text", "doc_id", k = 3).isEmpty)
    val cleaned = SubstringDedup.cleanedText(tiny, "text", "doc_id", k = 3)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(cleaned == Map(1L -> "a b", 2L -> "a b"))
  }
}
