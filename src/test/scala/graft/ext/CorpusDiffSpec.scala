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
}
