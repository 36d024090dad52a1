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

  val defs: Map[String, QueryDef] = QueryDef.checked(

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

    // SSSP to nation 0 along the directed ring: each nation in region 0
    // has a unique forward path to 0; other regions are unreachable.
    // Oracle: backward walk from the landmark over the ring edges.
    "q_graphx_sssp" -> QueryDef(
      """WITH RECURSIVE e AS (
        |  SELECT n_nationkey AS src,
        |         COALESCE(LEAD(n_nationkey) OVER (PARTITION BY n_regionkey ORDER BY n_nationkey),
        |                  MIN(n_nationkey) OVER (PARTITION BY n_regionkey)) AS dst
        |  FROM nation),
        |walk AS (
        |  SELECT 0 AS nk, 0 AS dist
        |  UNION ALL
        |  SELECT e.src, dist + 1 FROM walk JOIN e ON e.dst = walk.nk
        |  WHERE dist < 50 AND e.src <> 0)
        |SELECT nk AS n_nationkey, CAST(MIN(dist) AS INTEGER) AS dist
        |FROM walk GROUP BY nk ORDER BY n_nationkey""".stripMargin) { (s, d) =>
      val g = TpchGraph.provider(s, d)
      GraphXBridge.shortestPathsTo(g, Seq(("Nation", "next")),
        graft.meta.GlobalNodeId.pack(2, 0))
        .select(
          PathExpand.localKey(col("GlobalNodeId")).cast(IntegerType)
            .as("n_nationkey"),
          col("dist").cast(IntegerType))
        .orderBy("n_nationkey")
    },

    // Triangle counting over a DERIVED co-location graph (suppliers in
    // the same nation form a clique): per-vertex triangles in a k-clique
    // are C(k-1, 2), so the ground truth is SQL-expressible. Exercises
    // GraphXBridge.triangleCounts' canonicalization + vertex-cut path.
    "q_graphx_triangles" -> QueryDef(
      """SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey,
        |       CAST((k-1)*(k-2)/2 AS BIGINT) AS triangles
        |FROM (SELECT s_suppkey,
        |             COUNT(*) OVER (PARTITION BY s_nationkey) AS k
        |      FROM supplier)
        |WHERE k >= 2 ORDER BY s_suppkey""".stripMargin) { (s, d) =>
      val sup = graft.Tables.load(s, d, "supplier")
        .select(col("s_suppkey").cast(LongType), col("s_nationkey"))
      val edges = sup.as("a")
        .join(sup.as("b"),
          col("a.s_nationkey") === col("b.s_nationkey") &&
            col("a.s_suppkey") < col("b.s_suppkey"))
        .select(col("a.s_suppkey"), col("b.s_suppkey"))
      GraphXBridge.triangleCounts(edges)
        .select(col("id").as("s_suppkey"),
          col("triangles").cast(LongType).as("triangles"))
        .orderBy("s_suppkey")
    },

    // personalized PageRank in exact integer fixed-point (r7): a
    // random walk from supplier 1 over the undirected supplier↔part
    // co-occurrence graph from lineitem — graph-proximity relevance
    // with a bit-for-bit oracle (the DuckDB side replays the integral
    // recurrence; chained CTEs generated from the SAME code that runs
    // the Spark rounds, so the recurrences cannot drift)
    "q_ppr" -> QueryDef({
      val edgeCte =
        """es AS (SELECT l_suppkey AS src, l_partkey + 10000000000 AS dst
          |       FROM lineitem),
          |e AS (SELECT DISTINCT src, dst FROM
          |       (SELECT src, dst FROM es
          |        UNION ALL SELECT dst AS src, src AS dst FROM es))""".stripMargin
      graft.ext.Ppr.oracleSqlFor(edgeCte, source = 1L, rounds = 6) +
        "\nORDER BY rank DESC, node LIMIT 100"
    }) { (s, d) =>
      val li = graft.Tables.load(s, d, "lineitem")
      val es = li.select(col("l_suppkey").cast(LongType).as("src"),
        (col("l_partkey") + 10000000000L).cast(LongType).as("dst"))
      val e = es.union(es.select(col("dst").as("src"), col("src").as("dst")))
      graft.ext.Ppr.personalized(e, "src", "dst", source = 1L, rounds = 6)
        .orderBy(col("rank").desc, col("node")).limit(100)
    },

    // topological layering + cycle detection (r12): Kahn rounds over a
    // mixed graph — customer→order dependency edges (a true 2-layer
    // DAG), order→lineitem-part edges (layer 2), and the nation ring
    // (genuine cycles → layer -1). Fixed 3 rounds = the determinism
    // contract; oracle CTEs generated from the same recurrence.
    // Node-id namespaces use 1e10-scale offsets: TPC-H keys grow
    // linearly with SF (orderkey = 6M·SF is the fastest), so 1e10
    // keeps customer/order/part ids disjoint through SF 1000+ — the
    // old 3M/7M offsets silently merged orders into the customer
    // range once SF ≳ 0.7
    "q_topo_layers" -> QueryDef({
      val edgeCte =
        """es AS (
          |  SELECT c_custkey + 20000000000 AS src,
          |         o_orderkey + 10000000000 AS dst
          |  FROM orders JOIN customer ON o_custkey = c_custkey
          |  UNION ALL
          |  SELECT l_orderkey + 10000000000 AS src,
          |         l_partkey + 30000000000 AS dst
          |  FROM lineitem
          |  UNION ALL
          |  SELECT n_nationkey AS src,
          |         COALESCE(LEAD(n_nationkey) OVER (
          |             PARTITION BY n_regionkey ORDER BY n_nationkey),
          |           MIN(n_nationkey) OVER (PARTITION BY n_regionkey))
          |           AS dst
          |  FROM nation),
          |e AS (SELECT DISTINCT src, dst FROM es)""".stripMargin
      graft.ext.Topo.oracleSqlFor(edgeCte, rounds = 3) +
        "\nORDER BY layer, node"
    }) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val ord = graft.Tables.load(s, d, "orders")
      val cust = graft.Tables.load(s, d, "customer")
      val li = graft.Tables.load(s, d, "lineitem")
      val nat = graft.Tables.load(s, d, "nation")
      val co = ord.join(cust, col("o_custkey") === col("c_custkey"))
        .select((col("c_custkey") + 20000000000L).cast(LongType).as("src"),
          (col("o_orderkey") + 10000000000L).cast(LongType).as("dst"))
      val ol = li.select(
        (col("l_orderkey") + 10000000000L).cast(LongType).as("src"),
        (col("l_partkey") + 30000000000L).cast(LongType).as("dst"))
      val w = Window.partitionBy("n_regionkey").orderBy("n_nationkey")
      val ring = nat.select(col("n_nationkey").cast(LongType).as("src"),
        coalesce(lead(col("n_nationkey"), 1).over(w),
          min(col("n_nationkey")).over(
            Window.partitionBy("n_regionkey")))
          .cast(LongType).as("dst"))
      graft.ext.Topo.layers(co.unionByName(ol).unionByName(ring),
        "src", "dst", rounds = 3)
        .orderBy("layer", "node")
    },

    // k-core peeling (r12): 4 synchronous peel rounds at k=16 over the
    // undirected supplier↔part co-occurrence graph — the dense-subgraph
    // prune between CC and LPA. Fixed rounds = the Lpa determinism
    // contract; the oracle's chained CTEs are generated from the SAME
    // code that drives the Spark rounds
    "q_kcore" -> QueryDef({
      val edgeCte =
        """es AS (SELECT l_suppkey AS src, l_partkey + 10000000000 AS dst
          |       FROM lineitem),
          |e AS (SELECT DISTINCT src, dst FROM
          |       (SELECT src, dst FROM es
          |        UNION ALL SELECT dst AS src, src AS dst FROM es))""".stripMargin
      graft.ext.KCore.oracleSqlFor(edgeCte, k = 16, rounds = 4) +
        "\nORDER BY node"
    }) { (s, d) =>
      val li = graft.Tables.load(s, d, "lineitem")
      val es = li.select(col("l_suppkey").cast(LongType).as("src"),
        (col("l_partkey") + 10000000000L).cast(LongType).as("dst"))
      val e = es.union(es.select(col("dst").as("src"), col("src").as("dst")))
      graft.ext.KCore.peel(e, "src", "dst", k = 16, rounds = 4)
        .orderBy("node")
    },

    // run-to-fixpoint face of k-core (r13): KCore.core iterates until a
    // peel removes nothing. The oracle exploits monotonicity — once the
    // fixpoint is reached every further peel round is a no-op, so the
    // SAME generated chained-CTE oracle at any round count ≥ convergence
    // equals the fixpoint exactly. Measured convergence: ≤ 2 rounds at
    // sf0.001, sf0.01 AND sf0.1 (DuckDB replay; degrees only grow with
    // sf, so bigger scales converge no slower); 5 is the safe overshoot
    // — kept small because the oracle engine inlines chained CTEs
    // exponentially — and an undershoot on a future fixture fails
    // visibly as a hash mismatch
    "q_kcore_fixpoint" -> QueryDef({
      val edgeCte =
        """es AS (SELECT l_suppkey AS src, l_partkey + 10000000000 AS dst
          |       FROM lineitem),
          |e AS (SELECT DISTINCT src, dst FROM
          |       (SELECT src, dst FROM es
          |        UNION ALL SELECT dst AS src, src AS dst FROM es))""".stripMargin
      graft.ext.KCore.oracleSqlFor(edgeCte, k = 16, rounds = 5) +
        "\nORDER BY node"
    }) { (s, d) =>
      val li = graft.Tables.load(s, d, "lineitem")
      val es = li.select(col("l_suppkey").cast(LongType).as("src"),
        (col("l_partkey") + 10000000000L).cast(LongType).as("dst"))
      val e = es.union(es.select(col("dst").as("src"), col("src").as("dst")))
      graft.ext.KCore.core(e, "src", "dst", k = 16)
        .orderBy("node")
    },

    // run-to-fixpoint face of Kahn layering (r13): Topo.sort peels
    // zero-in-degree frontiers until none remains; survivors (on or
    // downstream of a cycle — the nation ring) report layer -1. The
    // oracle is Topo.fixpointOracleSql's bounded-walk formulation (one
    // linear recursive CTE; see its scaladoc for the equivalence
    // proof) — this fixture's DAG depth is STRUCTURAL (customer→order→
    // part = 3 layers at every sf; the nation ring never peels), so
    // cap 5 overshoots at any scale
    "q_topo_sort" -> QueryDef({
      val edgeCte =
        """es AS (
          |  SELECT c_custkey + 20000000000 AS src,
          |         o_orderkey + 10000000000 AS dst
          |  FROM orders JOIN customer ON o_custkey = c_custkey
          |  UNION ALL
          |  SELECT l_orderkey + 10000000000 AS src,
          |         l_partkey + 30000000000 AS dst
          |  FROM lineitem
          |  UNION ALL
          |  SELECT n_nationkey AS src,
          |         COALESCE(LEAD(n_nationkey) OVER (
          |             PARTITION BY n_regionkey ORDER BY n_nationkey),
          |           MIN(n_nationkey) OVER (PARTITION BY n_regionkey))
          |           AS dst
          |  FROM nation),
          |e AS (SELECT DISTINCT src, dst FROM es)""".stripMargin
      graft.ext.Topo.fixpointOracleSql(edgeCte, cap = 5) +
        "\nORDER BY layer, node"
    }) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val ord = graft.Tables.load(s, d, "orders")
      val cust = graft.Tables.load(s, d, "customer")
      val li = graft.Tables.load(s, d, "lineitem")
      val nat = graft.Tables.load(s, d, "nation")
      val co = ord.join(cust, col("o_custkey") === col("c_custkey"))
        .select((col("c_custkey") + 20000000000L).cast(LongType).as("src"),
          (col("o_orderkey") + 10000000000L).cast(LongType).as("dst"))
      val ol = li.select(
        (col("l_orderkey") + 10000000000L).cast(LongType).as("src"),
        (col("l_partkey") + 30000000000L).cast(LongType).as("dst"))
      val w = Window.partitionBy("n_regionkey").orderBy("n_nationkey")
      val ring = nat.select(col("n_nationkey").cast(LongType).as("src"),
        coalesce(lead(col("n_nationkey"), 1).over(w),
          min(col("n_nationkey")).over(
            Window.partitionBy("n_regionkey")))
          .cast(LongType).as("dst"))
      graft.ext.Topo.sort(co.unionByName(ol).unionByName(ring),
        "src", "dst")
        .orderBy("layer", "node")
    },

    // deterministic synchronous label propagation (r7): 4 rounds over
    // the undirected supplier↔nation bipartite graph; most-frequent
    // in-neighbor label, ties to the SMALLEST label, fixed round
    // count — a pure function of the graph, replayed exactly by the
    // generated chained-CTE oracle
    "q_lpa" -> QueryDef({
      val edgeCte =
        """es AS (SELECT s_suppkey AS src, s_nationkey + 500000 AS dst
          |       FROM supplier),
          |e AS (SELECT DISTINCT src, dst FROM
          |       (SELECT src, dst FROM es
          |        UNION ALL SELECT dst AS src, src AS dst FROM es))""".stripMargin
      graft.ext.Lpa.oracleSqlFor(edgeCte, rounds = 4) + "\nORDER BY node"
    }) { (s, d) =>
      val sup = graft.Tables.load(s, d, "supplier")
      val es = sup.select(col("s_suppkey").cast(LongType).as("src"),
        (col("s_nationkey") + 500000L).cast(LongType).as("dst"))
      val e = es.union(es.select(col("dst").as("src"), col("src").as("dst")))
      graft.ext.Lpa.propagate(e, "src", "dst", rounds = 4).orderBy("node")
    },

    // strongly connected components (r7): the nation rings are 5-cycles
    // (one SCC per region); inRegion edges point at region nodes, which
    // are sinks → singleton SCCs. The oracle derives the same labels
    // from the transitive closure (mutual reachability, min member)
    "q_scc" -> QueryDef({
      val edgeCte =
        """e AS (
          |  SELECT CAST(n_nationkey AS BIGINT) AS src,
          |         CAST(COALESCE(
          |           LEAD(n_nationkey) OVER (PARTITION BY n_regionkey
          |                                   ORDER BY n_nationkey),
          |           MIN(n_nationkey) OVER (PARTITION BY n_regionkey))
          |           AS BIGINT) AS dst
          |  FROM nation
          |  UNION ALL
          |  SELECT CAST(n_nationkey AS BIGINT),
          |         CAST(n_regionkey + 1000 AS BIGINT) FROM nation)""".stripMargin
      graft.ext.Scc.oracleSqlFor(edgeCte) + "\nORDER BY node"
    }) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val nat = graft.Tables.load(s, d, "nation")
      val w = Window.partitionBy("n_regionkey").orderBy("n_nationkey")
      val wp = Window.partitionBy("n_regionkey")
      val ring = nat.select(col("n_nationkey").cast(LongType).as("src"),
        coalesce(lead(col("n_nationkey"), 1).over(w),
          min(col("n_nationkey")).over(wp)).cast(LongType).as("dst"))
      val inRegion = nat.select(col("n_nationkey").cast(LongType).as("src"),
        (col("n_regionkey") + 1000).cast(LongType).as("dst"))
      graft.ext.Scc.strongComponents(ring.union(inRegion), "src", "dst")
        .orderBy("node")
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
