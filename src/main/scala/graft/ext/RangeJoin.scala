package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval) join — beyond-reference extension (the reference has
  * no range joins, SURVEY §2.3): every (point, interval) pair with
  * `start <= point <= end`, optionally equi-keyed.
  *
  * Scale shape: Spark would plan the raw inequality join as a per-key
  * cross product (BroadcastNestedLoop at best). Instead the domain is
  * binned: each interval replicates to the `ceil(len/binWidth)+1`
  * buckets it overlaps, each point maps to exactly one bucket, and the
  * join is an EQUI-join on (keys, bucket) with the exact range predicate
  * as a post-filter — shuffle keyed, AQE-skew-handled, never a cross
  * product. Bin arithmetic is integer division (`DIV`), exact on the
  * full long domain (nanosecond timestamps overflow double precision).
  *
  * Pick `binWidth` near the typical interval length: shorter bins
  * replicate intervals more; longer bins put more non-matching pairs
  * through the post-filter. A degenerate huge interval replicates to
  * many buckets — cap interval length upstream if the data allows it.
  */
object RangeJoin {

  /** @param points    rows with `pointCol` (integral)
    * @param intervals rows with `startCol` <= `endCol` (integral)
    * @param keys      equi-key columns present on BOTH sides; other
    *                  column names must be disjoint across the inputs
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      pointCol: String, startCol: String, endCol: String,
      keys: Seq[String], binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val p = points.withColumn("__bin", expr(s"$pointCol DIV $binWidth"))
    val iv = intervals.withColumn("__bin", explode(sequence(
      expr(s"$startCol DIV $binWidth"), expr(s"$endCol DIV $binWidth"))))
    p.join(iv, (keys :+ "__bin").toSeq)
      .filter(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("__bin")
  }
}
