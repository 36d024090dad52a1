package graft.graph

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The 100 TB frontier-join posture (PLANS.md): node tables bucketed by
  * `GlobalNodeId` make frontier ⋈ table joins co-located — both sides
  * are hash-distributed by the join key at WRITE time, so the join
  * plans with zero shuffle exchanges. This spec proves the layout works
  * with the Spark version in use; the production path would register
  * the catalog's parquet tables with the same `bucketBy`.
  */
class BucketedSpec extends SparkSpec {

  test("bucketed-by-GlobalNodeId tables join with no shuffle exchange") {
    val s = spark
    import s.implicits._
    s.sql("DROP TABLE IF EXISTS b_nodes")
    s.sql("DROP TABLE IF EXISTS b_frontier")
    val nodes = (1L to 1000L).map(i => (i, s"n$i"))
      .toDF("GlobalNodeId", "name")
    val frontier = (1L to 1000L by 7).map(i => (i, i * 2))
      .toDF("GlobalNodeId", "payload")
    nodes.write.bucketBy(8, "GlobalNodeId").sortBy("GlobalNodeId")
      .mode("overwrite").saveAsTable("b_nodes")
    frontier.write.bucketBy(8, "GlobalNodeId").sortBy("GlobalNodeId")
      .mode("overwrite").saveAsTable("b_frontier")

    // disable broadcast so the co-location (not a broadcast) is what
    // eliminates the exchange
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val saved = s.conf.get(key)
    try {
      s.conf.set(key, "-1")
      val joined = s.table("b_frontier")
        .join(s.table("b_nodes"), "GlobalNodeId")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), plan)
      assert(joined.count() == 143)
      assert(joined.filter(col("GlobalNodeId") === 8L)
        .select("name").head().getString(0) == "n8")
    } finally {
      s.conf.set(key, saved)
      s.sql("DROP TABLE IF EXISTS b_nodes")
      s.sql("DROP TABLE IF EXISTS b_frontier")
    }
  }
}
