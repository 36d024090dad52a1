package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Count-Min sketch faces over [[graft.functions.CmsAgg]]: build a
  * fixed-size frequency sketch of an item stream (tokens, urls,
  * shingles) in one map-combined aggregation, then answer
  * point-frequency queries for ANY item as a pure column expression
  * with the sketch riding the plan as a literal (the
  * `Decontaminate.bloomHitsCol` shape — no join, no shuffle, stream-
  * safe). Estimates are upper bounds (`est ≥ true`; overshoot
  * ≤ 2n/width w.p. ≥ 1 − 2⁻ᵈᵉᵖᵗʰ).
  *
  * Hashing is the repo's portable md5 double-hash (`h1`/`h2` = the two
  * 60-bit md5 halves; cell r of item x is `(h1 + r·h2) mod width`), so
  * an external engine replays every cell and estimate bit-for-bit —
  * collisions included.
  *
  * 100 TB posture: the sketch is `depth·width` longs (default 80 KB)
  * whatever the corpus; build cost is one map pass + an elementwise-
  * sum merge tree (exactly associative — per-shard sketches roll up to
  * the identical matrix, the [[CorpusOverlap]] persisted-sketch
  * contract class); queries are map-only.
  */
object Cms {

  val DefaultDepth = 5
  val DefaultWidth = 2048

  /** the two portable 60-bit md5 halves of an item rendered as text */
  def itemH1(item: Column): Column =
    conv(substring(md5(item.cast(BinaryType)), 1, 15), 16, 10).cast(LongType)
  def itemH2(item: Column): Column =
    conv(substring(md5(item.cast(BinaryType)), 17, 15), 16, 10).cast(LongType)

  /** Build the sketch over every row of `itemCol` (one occurrence per
    * row): one aggregation job, driver receives `depth·width` longs.
    */
  def sketch(df: DataFrame, itemCol: Column,
      depth: Int = DefaultDepth, width: Int = DefaultWidth): Array[Long] =
    df.select(graft.functions.CmsAgg(
        itemH1(itemCol), itemH2(itemCol), depth, width).as("m"))
      .head().getSeq[Long](0).toArray

  /** elementwise sum — CMS merge is exact, so per-shard sketches roll
    * up to the same matrix one global build produces
    */
  def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    require(a.length == b.length, "sketch shapes differ")
    val out = new Array[Long](a.length)
    var i = 0
    while (i < a.length) { out(i) = a(i) + b(i); i += 1 }
    out
  }

  /** Point-frequency estimate for `item` — a pure column expression
    * (min over the item's `depth` cells; the sketch is a plan
    * literal): map-only, join-free, usable in streaming filters.
    */
  def estimateCol(item: Column, sketchBits: Array[Long],
      depth: Int = DefaultDepth, width: Int = DefaultWidth): Column = {
    require(sketchBits.length == depth * width, "sketch shape mismatch")
    val lit0 = typedlit(sketchBits)
    array_min(transform(sequence(lit(0), lit(depth - 1)), r =>
      element_at(lit0,
        (r * width).cast(IntegerType) +
          pmod(itemH1(item) + r.cast(LongType) * itemH2(item),
            lit(width.toLong)).cast(IntegerType) + 1)))
  }
}
