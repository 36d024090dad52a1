package graft.ext

import graft.SparkSpec

class CorpusDiffSpec extends SparkSpec {

  test("identical corpora diff to empty; adds/removes/changes each " +
    "classified; unchanged docs never appear") {
    val s = spark
    import s.implicits._
    val old = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma"))
      .toDF("doc_id", "text")
    assert(CorpusDiff.diff(old, old, "doc_id", "text").isEmpty)

    val cur = Seq((2L, "beta"), (3L, "gamma EDITED"), (4L, "delta"))
      .toDF("doc_id", "text")
    val got = CorpusDiff.diff(old, cur, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "removed", 3L -> "changed", 4L -> "added"),
      got.toString)
  }

  test("tokenDrift: injected surge heads the report with exact counts " +
    "and probabilities; a stable token's shift is ~0; vocab-only " +
    "tokens get count 0 on the absent side") {
    val s = spark
    import s.implicits._
    // old: 10 docs of "alpha beta"; cur: same plus a banner token
    // surging into half the docs, and one brand-new token
    val old = (0L until 10L).map(i => (i, "alpha beta")).toDF("doc_id", "text")
    val cur = (0L until 10L).map { i =>
      (i, if (i < 5) "alpha beta bannertoken" else "alpha beta")
    }.toDF("doc_id", "text")
      .union(Seq((99L, "newtoken")).toDF("doc_id", "text"))
    val rows = CorpusDiff.tokenDrift(old, cur, "text", topK = 10)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5))).toMap
    // totals: old 20 tokens; cur 26
    val (bo, bc, bpo, bpc, bs) = rows("bannertoken")
    assert((bo, bc) == (0L, 5L))
    assert(bpo == 0.0 && bpc == 5.0 / 26.0 && bs == 5.0 / 26.0)
    val (no_, nc, npo, npc, _) = rows("newtoken")
    assert((no_, nc) == (0L, 1L) && npo == 0.0 && npc == 1.0 / 26.0)
    val (ao, ac, apo, apc, as_) = rows("alpha")
    assert((ao, ac) == (10L, 10L))
    assert(apo == 10.0 / 20.0 && apc == 10.0 / 26.0 &&
      as_ == math.abs(10.0 / 26.0 - 10.0 / 20.0))
    // the surge heads the ordering (banner shift > alpha's dilution)
    val ordered = CorpusDiff.tokenDrift(old, cur, "text", topK = 10)
      .collect().map(_.getString(0)).toSeq
    assert(ordered.head == "bannertoken", ordered.toString)
  }
}
