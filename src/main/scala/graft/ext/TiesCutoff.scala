package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** TOP n WITH TIES without a single-partition window.
  *
  * `RANK() OVER (ORDER BY keys) <= k` plans an `Exchange
  * SinglePartition` — every row funnels through ONE window task, fine at
  * sf0.1 and catastrophic at 100×. The equivalent cutoff-key shape
  * (reference semantics: `WSelectQueryBlock` TOP ... WITH TIES keeps all
  * rows tying with the k-th ordered key): fetch the k-th key tuple with a
  * distributed TakeOrdered (the driver holds only k key-only rows), then
  * filter the base by lexicographic at-or-before-cutoff. Both jobs stay
  * fully parallel; PlanGuardSpec pins zero SinglePartition exchanges.
  */
object TiesCutoff {

  /** Rows whose ORDER BY key tuple ranks at-or-before the k-th ordered
    * tuple — i.e. `RANK() <= k` — computed without a global window.
    * `keys` are (expression, descending) in ORDER BY position; Spark's
    * default null placement (ASC nulls first, DESC nulls last) applies.
    * Returns the whole input when it has fewer than k rows.
    */
  def topWithTies(base: DataFrame, keys: Seq[(Column, Boolean)], k: Int): DataFrame = {
    require(k >= 0, s"TOP $k WITH TIES: n must be non-negative")
    if (k == 0) return base.limit(0)
    val keyNames = keys.indices.map(i => s"__tk_$i")
    val keyed = keys.zip(keyNames).foldLeft(base) { case (df, ((e, _), n)) =>
      df.withColumn(n, e)
    }
    val orderCols = keys.map(_._2).zip(keyNames).map { case (desc, n) =>
      if (desc) col(n).desc else col(n).asc
    }
    // k key-only rows via TakeOrderedAndProject — column pruning keeps
    // this first pass narrow even when `base` is a wide join
    val cutRows = keyed.select(keyNames.map(col): _*)
      .orderBy(orderCols: _*).limit(k).collect()
    if (cutRows.length < k) return base // fewer than k rows: keep all
    val cutoff = cutRows.last
    // lexicographic "sorts at-or-before the cutoff tuple":
    //   le(i) = lt(i) OR (eq(i) AND le(i+1)), innermost le = lt OR eq.
    // Cutoff values are driver-side literals, so null handling branches
    // in Scala: ASC puts nulls first (null cutoff admits only nulls),
    // DESC puts nulls last (null cutoff admits every non-null).
    def lt(i: Int): Column = {
      val c = col(keyNames(i))
      val cv = cutoff.get(i)
      val desc = keys(i)._2
      if (cv == null) { if (desc) c.isNotNull else lit(false) }
      else if (desc) c > lit(cv)
      else c.isNull || c < lit(cv)
    }
    def eq(i: Int): Column = col(keyNames(i)) <=> lit(cutoff.get(i))
    val last = keys.length - 1
    val pred = (0 until last).foldRight(lt(last) || eq(last)) { (i, inner) =>
      lt(i) || (eq(i) && inner)
    }
    keyed.filter(pred).drop(keyNames: _*)
  }
}
