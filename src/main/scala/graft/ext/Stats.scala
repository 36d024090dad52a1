package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distribution statistics over bounded-cardinality measures — the
  * corpus-profiling numbers a curation run reports (token-length
  * percentiles per source, value distributions per event type).
  *
  * [[exactQuantilesInt]] computes EXACT group-wise quantiles without a
  * per-group sort of the rows: collapse to a (group, value) histogram
  * first (one map-combined count — the key space is
  * groups × distinct values, not rows), then walk each group's
  * cumulative counts. The quantile rule is pure integer arithmetic
  * (`cum·1000 ≥ q‰·n` — the lower-quantile definition), so any engine
  * replays it bit-for-bit; no float rank, no interpolation.
  *
  * Scale: correct shape whenever the measure has bounded cardinality
  * (token counts, lengths, ratings, bucketed scores). The per-group
  * window runs over distinct VALUES, not rows — at 100 TB a group's
  * window holds e.g. a few thousand distinct lengths regardless of
  * row count. For continuous doubles, bucket first (multiply + floor)
  * and accept bin-width resolution; feeding unbounded-cardinality
  * doubles in directly degenerates to a per-group sort, which is the
  * caller's decision to make.
  */
object Stats {

  /** One row per (group, q‰): the smallest value whose cumulative
    * count reaches the q‰ rank. `qPerMille` entries in (0, 1000].
    */
  def exactQuantilesInt(df: DataFrame, keyCol: String, valCol: String,
      qPerMille: Seq[Int]): DataFrame = {
    require(qPerMille.nonEmpty && qPerMille.forall(q => q > 0 && q <= 1000),
      "quantiles are per-mille ranks in (0, 1000]")
    val counts = df
      .groupBy(col(keyCol), col(valCol).cast(LongType).as("__v"))
      .agg(count(lit(1)).as("__c"))
    val byKey = Window.partitionBy(keyCol)
    val cum = counts
      .withColumn("__cum", sum(col("__c")).over(
        byKey.orderBy("__v")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__n", sum(col("__c")).over(byKey))
    cum.withColumn("q_pm", explode(typedlit(qPerMille)))
      .filter(col("__cum") * 1000 >= col("q_pm").cast(LongType) * col("__n"))
      .groupBy(col(keyCol), col("q_pm"))
      .agg(min(col("__v")).as("value"))
  }
}
