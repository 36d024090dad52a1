package graft.queries

import graft.QueryDef
import graft.graph.TpchGraph
import graft.paths.PathExpand
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Variable-length path queries (SURVEY §2.4) over the Nation `next`
  * ring edge (a cycle within each region). DuckDB oracles reconstruct
  * the same ring with window functions and, for unbounded paths, a
  * recursive CTE bounded by the ring size — the relational mirror of
  * edge-/node-disjoint walk semantics on a simple cycle.
  */
object PathQueries {

  /** ring-edge definition shared by every oracle */
  private val ringCte =
    """WITH RECURSIVE e AS (
      |  SELECT n_nationkey AS src,
      |         COALESCE(LEAD(n_nationkey) OVER (PARTITION BY n_regionkey ORDER BY n_nationkey),
      |                  MIN(n_nationkey) OVER (PARTITION BY n_regionkey)) AS dst,
      |         n_regionkey AS rk
      |  FROM nation),
      |sz AS (SELECT n_regionkey AS rk, COUNT(*) AS n FROM nation GROUP BY 1)""".stripMargin

  private def pathDf(s: org.apache.spark.sql.SparkSession, d: String,
      minLen: Int, maxLen: Int, mode: PathExpand.Mode) =
    PathExpand.expand(TpchGraph.provider(s, d), "Nation", "next",
      minLen, maxLen, mode)
      .select(col("hops"),
        PathExpand.localKey(col("src")).cast(IntegerType).as("src"),
        PathExpand.localKey(col("dst")).cast(IntegerType).as("dst"),
        col("pathNodes"))

  val defs: Map[String, QueryDef] = QueryDef.checked(

    // bounded *1..2
    "q_path_1_2" -> QueryDef(
      s"""$ringCte
         |SELECT CAST(1 AS INTEGER) AS hops, src, dst FROM e
         |UNION ALL
         |SELECT CAST(2 AS INTEGER), a.src, b.dst FROM e a JOIN e b ON a.dst = b.src
         |ORDER BY hops, src, dst""".stripMargin) { (s, d) =>
      pathDf(s, d, 1, 2, PathExpand.EdgeDisjoint)
        .select("hops", "src", "dst").orderBy("hops", "src", "dst")
    },

    // *0..1 — zero-length row binds sink = source (DeployScriptTemplate.tt:110-114)
    "q_path_0_1" -> QueryDef(
      s"""$ringCte
         |SELECT CAST(0 AS INTEGER) AS hops, n_nationkey AS src, n_nationkey AS dst FROM nation
         |UNION ALL
         |SELECT CAST(1 AS INTEGER), src, dst FROM e
         |ORDER BY hops, src, dst""".stripMargin) { (s, d) =>
      pathDf(s, d, 0, 1, PathExpand.EdgeDisjoint)
        .select("hops", "src", "dst").orderBy("hops", "src", "dst")
    },

    // unbounded * with edge-disjoint walks: on a ring of size R each source
    // yields walks of 1..R hops (the R-th returns home, reusing no edge)
    "q_path_unbounded" -> QueryDef(
      s"""$ringCte,
         |walk AS (
         |  SELECT e.src, e.dst, 1 AS hops, e.rk FROM e
         |  UNION ALL
         |  SELECT w.src, e.dst, w.hops + 1, w.rk
         |  FROM walk w JOIN e ON w.dst = e.src JOIN sz ON sz.rk = w.rk
         |  WHERE w.hops < sz.n)
         |SELECT CAST(hops AS INTEGER) AS hops, src, dst FROM walk
         |ORDER BY hops, src, dst""".stripMargin) { (s, d) =>
      pathDf(s, d, 1, -1, PathExpand.EdgeDisjoint)
        .select("hops", "src", "dst").orderBy("hops", "src", "dst")
    },

    // node-disjoint variant (bfsPath_DifferNodes): the return-home hop is
    // excluded because the start node is already on the path
    "q_path_node_disjoint" -> QueryDef(
      s"""$ringCte,
         |walk AS (
         |  SELECT e.src, e.dst, 1 AS hops, e.rk FROM e
         |  UNION ALL
         |  SELECT w.src, e.dst, w.hops + 1, w.rk
         |  FROM walk w JOIN e ON w.dst = e.src JOIN sz ON sz.rk = w.rk
         |  WHERE w.hops < sz.n - 1)
         |SELECT CAST(hops AS INTEGER) AS hops, src, dst FROM walk
         |ORDER BY hops, src, dst""".stripMargin) { (s, d) =>
      pathDf(s, d, 1, -1, PathExpand.NodeDisjoint)
        .select("hops", "src", "dst").orderBy("hops", "src", "dst")
    },

    // path-message display (§2.4 path display): hop sequence rendered as a
    // string, mirroring the PathMessageDecoder output shape
    // typed path display: per-hop (nodeType, nodeId, edgeType) structs
    // accumulated during expansion, rendered as the reference's
    // PathMessageDecoder JSON (NodeTableGraphViewCodeTemplate.tt:640-698)
    "q_path_display" -> QueryDef(
      s"""$ringCte
         |SELECT a.src, b.dst,
         |  '[{"NodeType":"Nation","Id":' || CAST(a.src AS VARCHAR) ||
         |  '},{"EdgeType":"next"},{"NodeType":"Nation","Id":' || CAST(a.dst AS VARCHAR) ||
         |  '},{"EdgeType":"next"},{"NodeType":"Nation","Id":' || CAST(b.dst AS VARCHAR) ||
         |  '}]' AS path_str
         |FROM e a JOIN e b ON a.dst = b.src
         |ORDER BY a.src, b.dst, path_str""".stripMargin) { (s, d) =>
      val g = TpchGraph.provider(s, d)
      PathExpand.expand(g, "Nation", "next", 2, 2,
        PathExpand.EdgeDisjoint, display = true)
        .select(
          PathExpand.localKey(col("src")).cast(IntegerType).as("src"),
          PathExpand.localKey(col("dst")).cast(IntegerType).as("dst"),
          PathExpand.renderDisplay(g, "Nation", "next").as("path_str"))
        .orderBy("src", "dst", "path_str")
    }
  )
}
