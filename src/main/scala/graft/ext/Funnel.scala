package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Ordered k-stage funnel analysis over an event stream — for each
  * user, the earliest strictly-increasing chain of stage timestamps
  * (first `steps(0)`, then the first `steps(1)` AFTER it, …) and the
  * furthest stage reached. First-touch semantics: later, faster chains
  * do not replace the earliest one — the standard product-analytics
  * definition, and a deterministic one (each t_i is a min, so no float
  * or ordering ambiguity anywhere).
  *
  * Scale shape: one pass PER STAGE, each = a type-filtered scan
  * (the `event_type = step` predicate pushes into the source scan, so
  * a stage touches only its own rows), an equi-join on the user key
  * against the previous stage's (user, t_{i-1}) frame — which only
  * ever SHRINKS — and a map-combined `min` aggregation. No windows, no
  * per-user event sorting, nothing holds a user's history in memory;
  * the k joins hash on the same user key so AQE reuses the exchange.
  */
object Funnel {

  /** One row per distinct user: (`userCol`, t0 … t{k-1}, stage) where
    * t_i is the earliest `steps(i)` event strictly after t_{i-1}
    * (epoch-long units of `tsCol`) and stage = number of chained
    * stages reached (0 = user never hit `steps(0)`).
    */
  def stages(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, steps: Seq[String],
      maxGap: Option[Long] = None): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one stage")
    require(maxGap.forall(_ > 0), "maxGap must be positive")
    val users = events.select(col(userCol)).distinct()
    val stageFrames = steps.zipWithIndex
      .foldLeft(List.empty[DataFrame]) { case (acc, (step, i)) =>
        val ev = events.filter(col(typeCol) === step)
          .select(col(userCol), col(tsCol).as("__t"))
        val cur = acc match {
          case Nil =>
            ev.groupBy(userCol).agg(min(col("__t")).as(s"t$i"))
          case prev :: _ =>
            val within = maxGap match {
              // conversion deadline: each step within maxGap of the
              // previous stage time, not just anytime after
              case Some(g) => col("__t") > col(s"t${i - 1}") &&
                col("__t") <= col(s"t${i - 1}") + g
              case None => col("__t") > col(s"t${i - 1}")
            }
            ev.join(prev.select(col(userCol), col(s"t${i - 1}")), userCol)
              .filter(within)
              .groupBy(userCol).agg(min(col("__t")).as(s"t$i"))
        }
        cur :: acc
      }.reverse
    val joined = stageFrames.foldLeft(users)(
      (acc, sf) => acc.join(sf, Seq(userCol), "left_outer"))
    // fold ascending so the HIGHEST stage's isNotNull test lands
    // outermost in the nested CASE
    val stage = steps.indices
      .foldLeft(lit(0)) { (els, i) =>
        when(col(s"t$i").isNotNull, lit(i + 1)).otherwise(els)
      }
    joined.withColumn("stage", stage.cast(IntegerType))
  }

  /** Cohort retention: users bucketed by the period of their FIRST
    * event (cohort = first_ts ÷ `periodUnits`, fixed-epoch grid — no
    * data-dependent origin), counted once per (cohort, period-offset)
    * they were active in. All integer arithmetic.
    *
    * Shape: one map-combined min per user (first touch), one distinct
    * on (user, period) — 8+8 bytes per row — a user-key join, and a
    * map-combined count; the (cohort, offset) result is tiny. Nothing
    * holds per-user history.
    */
  private def backtick(c: String) = s"`$c`"

  def retention(events: DataFrame, userCol: String, tsCol: String,
      periodUnits: Long): DataFrame = {
    require(periodUnits > 0)
    // DIV, not `/`: Column./ is IEEE double division
    val firsts = events.groupBy(col(userCol))
      .agg(min(col(tsCol)).as("__first"))
      .select(col(userCol),
        expr(s"__first DIV ${periodUnits}L").as("cohort"))
    val active = events
      .select(col(userCol),
        expr(s"${backtick(tsCol)} DIV ${periodUnits}L").as("__p"))
      .distinct()
    active.join(firsts, userCol)
      .groupBy(col("cohort"),
        (col("__p") - col("cohort")).cast(IntegerType).as("period_offset"))
      .agg(count(lit(1)).as("users"))
  }
}
