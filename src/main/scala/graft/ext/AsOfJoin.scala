package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — the feature-lookup primitive of training
  * pipelines: for every left row, the LATEST right row with the same key
  * and `right.ts <= left.ts` (beyond-reference extension; the reference
  * has no range/as-of joins, SURVEY §2.3).
  *
  * Shape: instead of an inequality join (which Spark would plan as a
  * per-key cross product + argmax), both sides union and a single
  * running `last_value(..., ignoreNulls)` window carries each right
  * row's payload forward to the left rows that follow it in time —
  * ONE shuffle on the key, linear work, no join fan-out. Right rows at
  * exactly the left timestamp count as "before" (side ordering), the
  * standard at-or-before convention.
  */
object AsOfJoin {

  /** @param pick right column → output alias (aliases must not collide
    *   with left columns); rows with no prior right match get NULLs
    *   (left-join semantics)
    *
    * All picked columns travel as ONE struct through a single
    * `last_value(ignoreNulls)` — per-column carries could tear a row
    * when the latest right match holds NULL in one column (that column
    * would fall back to an OLDER right row, mixing two rows' values).
    */
  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
      tsCol: String, pick: Seq[(String, String)]): DataFrame = {
    val l = left.withColumn("__side", lit(1))
    val r = right
      .select((keys.map(col) :+ col(tsCol)) :+
        struct(pick.map { case (c, a) => col(c).as(a) }: _*).as("__r"): _*)
      .withColumn("__side", lit(0))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol).asc, col("__side").asc, col("__r").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = unioned.withColumn("__last",
      last(col("__r"), ignoreNulls = true).over(w))
    pick.foldLeft(filled.filter(col("__side") === 1)) { case (df, (_, a)) =>
      df.withColumn(a, col("__last").getField(a))
    }.drop("__side", "__r", "__last")
  }

  /** Hot-key-safe as-of: [[asOf]] partitions the window by key alone, so
    * one key holding a large share of the rows serializes one reducer.
    * This variant splits time into `bucketWidth`-wide buckets and runs
    * two phases:
    *
    *  1. in-bucket as-of partitioned by (key, bucket) — parallel across
    *     buckets, so a hot key spreads over its time range;
    *  2. rows with no in-bucket match take the "carry-in": the latest
    *     right row of any EARLIER bucket, computed as an as-of over the
    *     per-(key, bucket) summaries — one row per key×bucket, tiny.
    *
    * Result is row-for-row identical to [[asOf]]. `tsCol` must be
    * integral (epoch nanos/micros/millis); pick `bucketWidth` so a hot
    * key's rows spread over many buckets (e.g. one day of nanos).
    */
  def asOfBucketed(left: DataFrame, right: DataFrame, keys: Seq[String],
      tsCol: String, pick: Seq[(String, String)],
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val lb = left.withColumn("__b", expr(s"$tsCol DIV $bucketWidth"))
    val rb = right.withColumn("__b", expr(s"$tsCol DIV $bucketWidth"))
    // phase 1: in-bucket as-of; the extra __m_ts pick marks real matches
    // (right ts is never null, unlike legitimate null payload values)
    val marked = asOf(lb, rb, keys :+ "__b", tsCol,
      pick :+ (tsCol -> "__m_ts"))
    val hit = marked.filter(col("__m_ts").isNotNull).drop("__m_ts", "__b")
    // last right row per (key, bucket), shifted one bucket forward so a
    // summary is visible only to STRICTLY LATER buckets (a right row in
    // the left row's own bucket but after it must not match)
    val packed = struct((col(tsCol).as("__ts") +:
      pick.map { case (c, a) => col(c).as(a) }): _*)
    val summaries = rb.groupBy((keys :+ "__b").map(col): _*)
      .agg(max(packed).as("__m"))
      .select((keys.map(col) :+ (col("__b") + 1).as("__b") :+
        col("__m")): _*)
    val sumFlat = summaries.select(((keys.map(col) :+ col("__b")) ++
      pick.map { case (_, a) => col(s"__m.$a").as(s"__s_$a") }): _*)
    // phase 2: carry-in via as-of over the summaries, keyed on the
    // bucket index as "time"
    val missed = marked.filter(col("__m_ts").isNull)
      .drop(("__m_ts" +: pick.map(_._2)): _*)
    val carried = asOf(missed, sumFlat, keys, "__b",
      pick.map { case (_, a) => s"__s_$a" -> a }).drop("__b")
    hit.unionByName(carried)
  }
}
