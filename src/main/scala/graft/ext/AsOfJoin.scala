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
}
