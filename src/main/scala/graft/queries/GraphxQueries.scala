package graft.queries

import graft.QueryDef
import graft.graph.TpchGraph
import graft.graphx.GraphXBridge
import graft.paths.PathExpand
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** GraphX analytics over the graph — the north star's "GraphX for graph
  * analytics" leg. Both queries run on the Nation `next` ring, whose
  * analytic ground truth is SQL-expressible: connected components = the
  * per-region ring (component id = min member), and static PageRank on a
  * 1-out-regular cycle is exactly 1.0 everywhere (0.15 + 0.85·1 = 1).
  */
object GraphxQueries {

  val defs: Map[String, QueryDef] = Map(

    "q_graphx_cc" -> QueryDef(
      """SELECT n_nationkey,
        |       MIN(n_nationkey) OVER (PARTITION BY n_regionkey) AS cc
        |FROM nation ORDER BY n_nationkey""".stripMargin) { (s, d) =>
      val g = TpchGraph.provider(s, d)
      GraphXBridge.connectedComponents(g, Seq(("Nation", "next")))
        .select(
          PathExpand.localKey(col("GlobalNodeId")).cast(IntegerType)
            .as("n_nationkey"),
          PathExpand.localKey(col("component")).cast(IntegerType).as("cc"))
        .orderBy("n_nationkey")
    },

    "q_graphx_pagerank" -> QueryDef(
      """SELECT n_nationkey, CAST(1.0 AS DOUBLE) AS rank
        |FROM nation ORDER BY n_nationkey""".stripMargin) { (s, d) =>
      val g = TpchGraph.provider(s, d)
      GraphXBridge.pageRank(g, Seq(("Nation", "next")), iterations = 10)
        .select(
          PathExpand.localKey(col("GlobalNodeId")).cast(IntegerType)
            .as("n_nationkey"),
          col("rank"))
        .orderBy("n_nationkey")
    }
  )
}
