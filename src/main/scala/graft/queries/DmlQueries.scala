package graft.queries

import graft.Stage.StageOps

import graft.QueryDef
import graft.dml.GraphDml
import graft.graph.{GraphBuilder, OverlayProvider, TpchGraph}
import graft.pattern._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Graph DML round-trips (SURVEY §2.9), verified by querying the graph
  * AFTER the rewrite; the DuckDB oracle computes the equivalent state from
  * the flat tables. Covers: INSERT EDGE (append + degree bump), DELETE
  * EDGE (tombstone filter in traversal), compaction equivalence, INSERT
  * NODE.
  */
object DmlQueries {

  val defs: Map[String, QueryDef] = QueryDef.checked(

    // INSERT EDGE: duplicate every 'placed' edge of orders > 490000, then
    // read the new live out-degree
    "q_dml_insert_edge" -> QueryDef(
      """SELECT c_custkey,
        |  CAST((SELECT COUNT(*) FROM orders WHERE o_custkey = c_custkey)
        |     + (SELECT COUNT(*) FROM orders
        |        WHERE o_custkey = c_custkey AND o_totalprice > 490000)
        |    AS INTEGER) AS out_deg
        |FROM customer ORDER BY c_custkey""".stripMargin) { (s, d) =>
      val g = TpchGraph.provider(s, d)
      val ed = g.schema.table("Customer").edge("placed")
      val extra = graft.Tables.load(s, d, "orders")
        .filter(col("o_totalprice") > 490000)
        .select(GraphBuilder.gid(3, col("o_custkey")).as("src"),
          GraphBuilder.gid(6, col("o_orderkey")).as("sink"),
          col("o_totalprice").as("totalprice"),
          col("o_orderstatus").as("status"))
      GraphDml.insertEdges(g.nodeTable("Customer"), ed, extra)
        .select(col("c_custkey"), col("placedOutDegree").as("out_deg"))
        .orderBy("c_custkey")
    },

    // INSERT EDGE, sink side: mirror the same duplicate batch into the
    // Order side via numberNewEdges → insertEdgesSinkSide, then read the
    // sink state. InDegree doubles for duplicated orders; the appended
    // mirror entry's sink pointer resolves the owning customer; and its
    // srcEdgeId equals the customer's pre-insert out-degree plus the
    // edge's position in the deterministic (sink-sorted) batch numbering
    // — i.e. the mirror records exactly the forward edgeId insertEdges
    // assigns (TranslateDataModificationVisitor.cs:288-351)
    "q_dml_insert_edge_mirror" -> QueryDef(
      """SELECT o_orderkey AS orderkey,
        |  CAST(CASE WHEN o_totalprice > 490000 THEN 2 ELSE 1 END AS INTEGER) AS live_in,
        |  o_custkey AS custkey,
        |  CAST(CASE WHEN o_totalprice > 490000 THEN
        |      (SELECT COUNT(*) FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
        |    + (SELECT COUNT(*) FROM orders o3 WHERE o3.o_custkey = o.o_custkey
        |       AND o3.o_totalprice > 490000 AND o3.o_orderkey < o.o_orderkey)
        |  END AS INTEGER) AS src_edge_id
        |FROM orders o ORDER BY orderkey""".stripMargin) { (s, d) =>
      val g = TpchGraph.provider(s, d)
      val ed = g.schema.table("Customer").edge("placed")
      val extra = graft.Tables.load(s, d, "orders")
        .filter(col("o_totalprice") > 490000)
        .select(GraphBuilder.gid(3, col("o_custkey")).as("src"),
          GraphBuilder.gid(6, col("o_orderkey")).as("sink"),
          col("o_totalprice").as("totalprice"),
          col("o_orderstatus").as("status"))
      val numbered = GraphDml
        .numberNewEdges(g.nodeTable("Customer"), ed, extra)
        .stageBoundary
      val mask = (1L << graft.meta.GlobalNodeId.KeyBits) - 1
      val dup = col("o_totalprice") > 490000
      GraphDml.insertEdgesSinkSide(g.nodeTable("Order"), ed, numbered)
        .select(col("o_orderkey").as("orderkey"),
          col("InDegree").as("live_in"),
          element_at(col(ed.reversedColumnName), -1).getField("sink")
            .bitwiseAND(lit(mask)).as("custkey"),
          when(dup, element_at(col(ed.reversedColumnName), -1)
            .getField("srcEdgeId")).as("src_edge_id"))
        .orderBy("orderkey")
    },

    // DELETE EDGE: tombstone all placed edges with status attr 'F', then
    // traverse — the tombstone filter must hide them
    "q_dml_delete_edge" -> QueryDef(
      """SELECT o_custkey AS c_custkey, COUNT(*) AS cnt
        |FROM orders WHERE o_orderstatus <> 'F'
        |GROUP BY o_custkey ORDER BY c_custkey""".stripMargin) { (s, d) =>
      val g = TpchGraph.provider(s, d)
      val ed = g.schema.table("Customer").edge("placed")
      val cust = g.nodeTable("Customer")
      val doomed = cust
        .select(col("GlobalNodeId").as("src"), explode(col("placed")).as("e"))
        .filter(col("e.status") === "F")
        .select(col("src"), col("e.edgeId").as("edgeId"))
      val afterDelete = GraphDml.deleteEdges(cust, ed, doomed)
      MatchPlanner.plan(
        OverlayProvider(g, Map("Customer" -> afterDelete)),
        MatchPattern(
          Seq(NodePat("c", "Customer"), NodePat("o", "Order")),
          Seq(EdgePat("c", "placed", "o"))))
        .groupBy(col("c__c_custkey").as("c_custkey"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy("c_custkey")
    },

    // DELETE EDGE, sink side: tombstone the reversed mirrors of all 'F'
    // placed edges incrementally (deleteEdgesSinkSide — the O(deleted)
    // keyed join, never a mirror rebuild), then read the Order side:
    // live InDegree must drop and the surviving mirror entry must still
    // resolve the owning customer through srcEdgeId-consistent state
    // (TranslateDataModificationVisitor.cs:288-351, 1829-1897)
    "q_dml_delete_edge_reversed" -> QueryDef(
      """SELECT o_orderkey AS orderkey,
        |  CAST(CASE WHEN o_orderstatus <> 'F' THEN 1 ELSE 0 END AS INTEGER) AS live_in,
        |  CASE WHEN o_orderstatus <> 'F' THEN o_custkey END AS custkey
        |FROM orders ORDER BY orderkey""".stripMargin) { (s, d) =>
      val g = TpchGraph.provider(s, d)
      val ed = g.schema.table("Customer").edge("placed")
      val doomed = g.nodeTable("Customer")
        .select(col("GlobalNodeId").as("src"), explode(col("placed")).as("e"))
        .filter(col("e.status") === "F")
        .select(col("src"), col("e.edgeId").as("edgeId"),
          col("e.sink").as("sink"))
      val rc = ed.reversedColumnName
      val rdc = ed.reversedDelColumnName
      val mask = (1L << graft.meta.GlobalNodeId.KeyBits) - 1
      GraphDml.deleteEdgesSinkSide(g.nodeTable("Order"), ed, doomed)
        .withColumn("__live",
          expr(s"filter($rc, x -> NOT array_contains($rdc, x.edgeId))"))
        .select(col("o_orderkey").as("orderkey"),
          col("InDegree").as("live_in"),
          try_element_at(col("__live"), lit(1)).getField("sink")
            .bitwiseAND(lit(mask)).as("custkey"))
        .orderBy("orderkey")
    },

    // DELETE NODE: append edgeless synthetic customers, then delete the
    // even-keyed half — the reference's safety guard passes (no live
    // edges) while nodes with edges stay untouched
    // (TranslateDataModificationVisitor.cs:2085-2188)
    // synthetic-node keys sit at +1e11 — far outside any replicated
    // TPC-H key range (the sf1 replicator shifts keys by k*1e6; the r13
    // sf1 full-suite run caught the old +1e6 offset colliding with
    // replica 1's custkeys) and comfortably inside GlobalNodeId's
    // 48-bit key space (2^48 ≈ 2.8e14)
    "q_dml_delete_node" -> QueryDef(
      """SELECT custkey FROM (
        |  SELECT c_custkey AS custkey FROM customer
        |  UNION ALL
        |  SELECT s_suppkey + 100000000000 AS custkey FROM supplier
        |  WHERE (s_suppkey + 100000000000) % 2 <> 0) t
        |ORDER BY custkey""".stripMargin) { (s, d) =>
      val g = TpchGraph.provider(s, d)
      val td = g.schema.table("Customer")
      val rows = graft.Tables.load(s, d, "supplier")
        .select((col("s_suppkey") + 100000000000L).as("c_custkey"),
          col("s_name").as("c_name"),
          col("s_acctbal").as("c_acctbal"),
          lit("SYNTH").as("c_mktsegment"))
      val withSynth =
        GraphDml.insertNodes(g.nodeTable("Customer"), td, rows, "c_custkey")
      GraphDml.deleteNodes(withSynth, td,
        col("c_mktsegment") === "SYNTH" && col("c_custkey") % 2 === 0)
        .select(col("c_custkey").as("custkey"))
        .orderBy("custkey")
    },

    // compaction equivalence: same query after Recycle-style rebuild
    "q_dml_compact" -> QueryDef(
      """SELECT o_custkey AS c_custkey, COUNT(*) AS cnt
        |FROM orders WHERE o_orderstatus <> 'F'
        |GROUP BY o_custkey ORDER BY c_custkey""".stripMargin) { (s, d) =>
      val g = TpchGraph.provider(s, d)
      val ed = g.schema.table("Customer").edge("placed")
      val cust = g.nodeTable("Customer")
      val doomed = cust
        .select(col("GlobalNodeId").as("src"), explode(col("placed")).as("e"))
        .filter(col("e.status") === "F")
        .select(col("src"), col("e.edgeId").as("edgeId"))
      val compacted = GraphDml.compact(
        GraphDml.deleteEdges(cust, ed, doomed), ed)
      MatchPlanner.plan(
        OverlayProvider(g, Map("Customer" -> compacted)),
        MatchPattern(
          Seq(NodePat("c", "Customer"), NodePat("o", "Order")),
          Seq(EdgePat("c", "placed", "o"))))
        .groupBy(col("c__c_custkey").as("c_custkey"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy("c_custkey")
    },

    // UPDATE properties: floor negative balances to zero, tag their
    // segment — assignments read the OLD row (bal reset + segment tag
    // must both key off the pre-update balance)
    "q_dml_update" -> QueryDef(
      """SELECT c_custkey,
        |  CASE WHEN c_acctbal < 0 THEN 0.0 ELSE c_acctbal END AS bal,
        |  CASE WHEN c_acctbal < 0 THEN 'FLOORED' ELSE c_mktsegment END AS seg
        |FROM customer ORDER BY c_custkey""".stripMargin) { (s, d) =>
      val g = TpchGraph.provider(s, d)
      val td = g.schema.table("Customer")
      GraphDml.updateProperties(g.nodeTable("Customer"), td,
        Seq("c_acctbal" -> lit(0.0), "c_mktsegment" -> lit("FLOORED")),
        col("c_acctbal") < 0)
        .select(col("c_custkey"), col("c_acctbal").as("bal"),
          col("c_mktsegment").as("seg"))
        .orderBy("c_custkey")
    },

    // bulk load end-to-end (BulkInsert.cs:486,771): stage CSVs from the
    // driver's parquet, CREATE NODE TABLE + bulkInsertNode/Edge into a
    // fresh catalog, then answer through MATCH over the loaded graph —
    // the oracle recomputes from the flat tables directly
    "q_bulk_load" -> QueryDef(
      """SELECT CAST(n.n_nationkey AS INTEGER) AS nationkey, r.r_name AS region
        |FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
        |ORDER BY nationkey""".stripMargin) { (s, d) =>
      val dir = graft.QueryDef.scratchDir("graft_bulk")
      val nation = graft.Tables.load(s, d, "nation")
      val region = graft.Tables.load(s, d, "region")
      // the three staging CSVs are independent of each other — overlap
      // the writes (guide §2.6); all complete before any load reads them
      locally {
        import scala.concurrent.{Await, ExecutionContext, Future}
        import scala.concurrent.duration.Duration
        implicit val ec: ExecutionContext = ExecutionContext.global
        val ws = Seq(
          Future(region.select(
            col("r_regionkey").cast(IntegerType).as("rk"),
            col("r_name").as("rname"))
            .coalesce(1).write.option("header", "true")
            .csv(s"$dir/region_csv")),
          Future(nation.select(
            col("n_nationkey").cast(IntegerType).as("nk"),
            col("n_name").as("nname"))
            .coalesce(1).write.option("header", "true")
            .csv(s"$dir/nation_csv")),
          Future(nation.select(
            col("n_nationkey").cast(IntegerType).as("nk"),
            col("n_regionkey").cast(IntegerType).as("rk"))
            .coalesce(1).write.option("header", "true")
            .csv(s"$dir/edge_csv")))
        ws.foreach(Await.result(_, Duration.Inf))
      }
      val cat = new graft.ddl.GraphCatalog(s, s"$dir/cat")
      val gs = new graft.lang.GraphSession(s, cat)
      gs.sql("CREATE NODE TABLE RegionT (rk INT NODEID, rname STRING)")
      gs.sql("""CREATE NODE TABLE NationT (
               |  nk INT NODEID, nname STRING, EDGE inR TO RegionT)""".stripMargin)
      graft.load.BulkLoad.bulkInsertNode(cat, "RegionT", s"$dir/region_csv")
      graft.load.BulkLoad.bulkInsertNode(cat, "NationT", s"$dir/nation_csv")
      graft.load.BulkLoad.bulkInsertEdge(cat, "NationT", "inR", s"$dir/edge_csv")
      gs.sql(
        """SELECT n.nk AS nationkey, r.rname AS region
          |FROM NationT n, RegionT r MATCH n-[inR]->r
          |ORDER BY nationkey""".stripMargin)
    },

    // INSERT NODE: append synthetic customers (supplier-derived keys,
    // offset to avoid collision), empty adjacency — then scan keys
    "q_dml_insert_node" -> QueryDef(
      """SELECT custkey FROM (
        |  SELECT c_custkey AS custkey FROM customer
        |  UNION ALL
        |  SELECT s_suppkey + 100000000000 AS custkey FROM supplier) t
        |ORDER BY custkey""".stripMargin) { (s, d) =>
      val g = TpchGraph.provider(s, d)
      val td = g.schema.table("Customer")
      val rows = graft.Tables.load(s, d, "supplier")
        .select((col("s_suppkey") + 100000000000L).as("c_custkey"),
          col("s_name").as("c_name"),
          col("s_acctbal").as("c_acctbal"),
          lit("SYNTH").as("c_mktsegment"))
      GraphDml.insertNodes(g.nodeTable("Customer"), td, rows, "c_custkey")
        .select(col("c_custkey").as("custkey"))
        .orderBy("custkey")
    }
  )
}
