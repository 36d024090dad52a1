package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys — the manual lever behind the
  * "degree-aware salting on frontier joins" posture (SURVEY §7.4) for
  * when AQE's skew-join split isn't available (e.g. broadcast-disabled
  * hub expansions, or pre-AQE shuffle stages):
  *
  *  - the skewed (large, hot-keyed) side gets a random salt in
  *    [0, factor);
  *  - the small side replicates `factor` times with every salt value;
  *  - the join key becomes (key, salt), spreading each hot key over
  *    `factor` reducers.
  *
  * Exact same join semantics, `factor`× replication of the small side —
  * use for hub nodes where one key would otherwise pin a single reducer.
  */
object SkewJoin {

  /** join types where replicating the small side is semantics-preserving:
    * an unmatched small-side row either disappears (inner/semi) or never
    * null-extends (left_outer keeps the skewed side). right/full outer
    * would emit unmatched small-side rows `factor` times.
    */
  private val SafeJoinTypes =
    Set("inner", "left_outer", "leftouter", "left", "left_semi", "leftsemi",
      "left_anti", "leftanti", "cross")

  def salted(skewed: DataFrame, small: DataFrame, key: String,
      factor: Int, joinType: String = "inner"): DataFrame = {
    require(factor >= 1, "salt factor must be >= 1")
    require(SafeJoinTypes(joinType.toLowerCase),
      s"salted join does not preserve $joinType semantics " +
        "(small side is replicated); use inner/left_outer/left_semi/left_anti")
    val s = skewed.withColumn("__salt",
      (rand(seed = 7) * factor).cast("int"))
    val r = small.withColumn("__salt",
      explode(sequence(lit(0), lit(factor - 1))))
    s.join(r, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Degree-aware variant: only keys above `hotThreshold` occurrences
    * salt at `factor`; the cold tail joins with salt 0 and no
    * replication blow-up. One pass over the skewed side computes the hot
    * set (broadcast back).
    */
  def saltedByDegree(skewed: DataFrame, small: DataFrame, key: String,
      factor: Int, hotThreshold: Long): DataFrame = {
    val hot = skewed.groupBy(col(key)).count()
      .filter(col("count") >= hotThreshold)
      .select(col(key).as("__hotKey"))
    val sTagged = skewed
      .join(broadcast(hot), col(key) === col("__hotKey"), "left_outer")
      .withColumn("__salt",
        when(col("__hotKey").isNotNull, (rand(seed = 7) * factor).cast("int"))
          .otherwise(lit(0)))
      .drop("__hotKey")
    val rTagged = small
      .join(broadcast(hot), col(key) === col("__hotKey"), "left_outer")
      .withColumn("__salts",
        when(col("__hotKey").isNotNull, sequence(lit(0), lit(factor - 1)))
          .otherwise(array(lit(0))))
      .withColumn("__salt", explode(col("__salts")))
      .drop("__hotKey", "__salts")
    sTagged.join(rTagged, Seq(key, "__salt"), "inner").drop("__salt")
  }
}
