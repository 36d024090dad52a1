package graft.queries

import graft.QueryDef
import graft.graph.TpchGraph
import graft.pattern._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Graph MATCH queries over the FIXTURES.md §B graph (SURVEY §2.3-§2.6).
  * Each DuckDB oracle is the flat relational formulation over the raw
  * parquet tables — exactly how the reference compiles MATCH to joins.
  */
object GraphQueries {

  private def dec(c: org.apache.spark.sql.Column) = c.cast(DecimalType(18, 2))

  val defs: Map[String, QueryDef] = QueryDef.checked(

    // 1-hop MATCH: Customer-[locatedIn]->Nation (forward adjacency explode)
    "q_match_1hop" -> QueryDef(
      """SELECT c_custkey, c_name, n_name
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |WHERE n_name = 'NATION_7' ORDER BY c_custkey""".stripMargin) { (s, d) =>
      val g = TpchGraph.provider(s, d)
      MatchPlanner.plan(g, MatchPattern(
        Seq(NodePat("c", "Customer"), NodePat("n", "Nation")),
        Seq(EdgePat("c", "locatedIn", "n"))))
        .filter(col("n__n_name") === "NATION_7")
        .select(col("c__c_custkey").as("c_custkey"),
          col("c__c_name").as("c_name"),
          col("n__n_name").as("n_name"))
        .orderBy("c_custkey")
    },

    // same shape but planned from the Nation side → exercises the
    // reversed adjacency column (GraphViewConnection.cs:1053-1146)
    "q_match_1hop_reversed" -> QueryDef(
      """SELECT c_custkey, c_name, n_name
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |WHERE n_name = 'NATION_7' ORDER BY c_custkey""".stripMargin) { (s, d) =>
      val g = TpchGraph.provider(s, d)
      MatchPlanner.plan(g, MatchPattern(
        Seq(NodePat("n", "Nation"), NodePat("c", "Customer")),
        Seq(EdgePat("c", "locatedIn", "n"))))
        .filter(col("n__n_name") === "NATION_7")
        .select(col("c__c_custkey").as("c_custkey"),
          col("c__c_name").as("c_name"),
          col("n__n_name").as("n_name"))
        .orderBy("c_custkey")
    },

    // 2-hop heterogeneous MATCH: Customer-[placed]->Order-[contains]->Part
    "q_match_2hop" -> QueryDef(
      """SELECT c_custkey, o_orderkey, p_partkey
        |FROM customer
        |JOIN orders ON o_custkey = c_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN part ON p_partkey = l_partkey
        |WHERE o_totalprice > 400000 AND p_size > 45
        |ORDER BY c_custkey, o_orderkey, p_partkey""".stripMargin) { (s, d) =>
      val g = TpchGraph.provider(s, d)
      MatchPlanner.plan(g, MatchPattern(
        Seq(NodePat("c", "Customer"), NodePat("o", "Order"), NodePat("p", "Part")),
        Seq(EdgePat("c", "placed", "o"), EdgePat("o", "contains", "p"))))
        .filter(col("o__o_totalprice") > 400000 && col("p__p_size") > 45)
        .select(col("c__c_custkey").as("c_custkey"),
          col("o__o_orderkey").as("o_orderkey"),
          col("p__p_partkey").as("p_partkey"))
        .orderBy("c_custkey", "o_orderkey", "p_partkey")
    },

    // diamond: two edges into the same Nation node (join-order stress)
    "q_match_diamond" -> QueryDef(
      """SELECT c_custkey, s_suppkey, n_name
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN supplier ON s_nationkey = n_nationkey
        |WHERE n_name = 'NATION_3' AND c_acctbal > 9000
        |ORDER BY c_custkey, s_suppkey""".stripMargin) { (s, d) =>
      val g = TpchGraph.provider(s, d)
      MatchPlanner.plan(g, MatchPattern(
        Seq(NodePat("c", "Customer"), NodePat("n", "Nation"),
          NodePat("sup", "Supplier")),
        Seq(EdgePat("c", "locatedIn", "n"), EdgePat("sup", "locatedIn", "n"))))
        .filter(col("n__n_name") === "NATION_3" && col("c__c_acctbal") > 9000)
        .select(col("c__c_custkey").as("c_custkey"),
          col("sup__s_suppkey").as("s_suppkey"),
          col("n__n_name").as("n_name"))
        .orderBy("c_custkey", "s_suppkey")
    },

    // per-edge attribute predicate in the pattern: {discount: 0.0}
    // (GraphViewParser.cs:176-190 → filter inside the traversal)
    "q_match_edge_attr" -> QueryDef(
      """SELECT l_orderkey AS o_orderkey, l_partkey AS p_partkey,
        |       l_quantity AS quantity
        |FROM lineitem WHERE l_discount = 0.0
        |ORDER BY o_orderkey, p_partkey, quantity""".stripMargin) { (s, d) =>
      val g = TpchGraph.provider(s, d)
      MatchPlanner.plan(g, MatchPattern(
        Seq(NodePat("o", "Order"), NodePat("p", "Part")),
        Seq(EdgePat("o", "contains", "p", attrEq = Map("discount" -> 0.0)))))
        .select(col("o__o_orderkey").as("o_orderkey"),
          col("p__p_partkey").as("p_partkey"),
          col("o_contains_p__quantity").as("quantity"))
        .orderBy("o_orderkey", "p_partkey", "quantity")
    },

    // aggregation over matches: revenue per customer from edge attributes
    "q_match_agg" -> QueryDef(
      """SELECT c_custkey, COUNT(*) AS order_cnt,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM customer JOIN orders ON o_custkey = c_custkey
        |GROUP BY c_custkey HAVING COUNT(*) > 15
        |ORDER BY c_custkey""".stripMargin) { (s, d) =>
      val g = TpchGraph.provider(s, d)
      MatchPlanner.plan(g, MatchPattern(
        Seq(NodePat("c", "Customer"), NodePat("o", "Order")),
        Seq(EdgePat("c", "placed", "o"))))
        .groupBy(col("c__c_custkey").as("c_custkey"))
        .agg(count(lit(1)).as("order_cnt"),
          sum(dec(col("c_placed_o__totalprice"))).cast(DoubleType).as("revenue"))
        .filter(col("order_cnt") > 15)
        .orderBy("c_custkey")
    },

    // degree bookkeeping: Nation.InDegree = next-ring (1) + customers + suppliers
    "q_match_indegree" -> QueryDef(
      """SELECT n_name,
        |  CAST(1 + (SELECT COUNT(*) FROM customer WHERE c_nationkey = n_nationkey)
        |         + (SELECT COUNT(*) FROM supplier WHERE s_nationkey = n_nationkey)
        |       AS INTEGER) AS in_deg
        |FROM nation ORDER BY n_name""".stripMargin) { (s, d) =>
      TpchGraph.provider(s, d).nodeTable("Nation")
        .select(col("n_name"), col("InDegree").as("in_deg"))
        .orderBy("n_name")
    },

    // out-degree via adjacency size: distinct parts per supplier
    "q_match_outdegree" -> QueryDef(
      """SELECT s_suppkey,
        |  CAST((SELECT COUNT(DISTINCT l_partkey) FROM lineitem
        |        WHERE l_suppkey = s_suppkey) AS INTEGER) AS out_deg
        |FROM supplier ORDER BY s_suppkey""".stripMargin) { (s, d) =>
      TpchGraph.provider(s, d).nodeTable("Supplier")
        .select(col("s_suppkey"), col("suppliesOutDegree").as("out_deg"))
        .orderBy("s_suppkey")
    },

    // node view: union of Customer+Supplier with _NodeType discriminator
    // (View.cs:95-136; _NodeType emission TranslateMatchClauseVisitor.cs:560-571)
    "q_match_node_view" -> QueryDef(
      """SELECT 'Customer' AS _NodeType, c_name AS name, c_acctbal AS acctbal
        |FROM customer
        |UNION ALL
        |SELECT 'Supplier' AS _NodeType, s_name AS name, s_acctbal AS acctbal
        |FROM supplier
        |ORDER BY _NodeType, name""".stripMargin) { (s, d) =>
      val g = TpchGraph.provider(s, d)
      val c = g.nodeTable("Customer").select(
        lit("Customer").as("_NodeType"), col("c_name").as("name"),
        col("c_acctbal").as("acctbal"))
      val sup = g.nodeTable("Supplier").select(
        lit("Supplier").as("_NodeType"), col("s_name").as("name"),
        col("s_acctbal").as("acctbal"))
      c.unionAll(sup).orderBy("_NodeType", "name")
    },

    // edge view: locatedIn across source tables with _EdgeType
    // (View.cs:830-912 — union of per-table edge decoders)
    "q_match_edge_view" -> QueryDef(
      """SELECT 'Customer' AS src_type, c_custkey AS src_key, n_name
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |UNION ALL
        |SELECT 'Supplier' AS src_type, s_suppkey AS src_key, n_name
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |ORDER BY src_type, src_key""".stripMargin) { (s, d) =>
      val g = TpchGraph.provider(s, d)
      def side(alias: String, table: String, keyCol: String, tag: String) =
        MatchPlanner.plan(g, MatchPattern(
          Seq(NodePat(alias, table), NodePat("n", "Nation")),
          Seq(EdgePat(alias, "locatedIn", "n"))))
          .select(lit(tag).as("src_type"),
            col(s"${alias}__$keyCol").as("src_key"),
            col("n__n_name").as("n_name"))
      side("c", "Customer", "c_custkey", "Customer")
        .unionAll(side("sup", "Supplier", "s_suppkey", "Supplier"))
        .orderBy("src_type", "src_key")
    },

    // global node view over every table of the schema (View.cs:2046)
    "q_match_global_view" -> QueryDef(
      """SELECT _NodeType, COUNT(*) AS cnt FROM (
        |  SELECT 'Customer' AS _NodeType FROM customer
        |  UNION ALL SELECT 'Event' FROM events
        |  UNION ALL SELECT 'Nation' FROM nation
        |  UNION ALL SELECT 'Order' FROM orders
        |  UNION ALL SELECT 'Part' FROM part
        |  UNION ALL SELECT 'Region' FROM region
        |  UNION ALL SELECT 'Supplier' FROM supplier
        |  UNION ALL SELECT 'User' FROM (SELECT DISTINCT user_id FROM events)) t
        |GROUP BY _NodeType ORDER BY _NodeType""".stripMargin) { (s, d) =>
      graft.graph.Views.globalNodeView(TpchGraph.provider(s, d))
        .groupBy("_NodeType").agg(count(lit(1)).as("cnt"))
        .orderBy("_NodeType")
    },

    // typed node view with property mapping (View.cs:95-136)
    "q_match_mapped_view" -> QueryDef(
      """SELECT _NodeType, name, acctbal FROM (
        |  SELECT 'Customer' AS _NodeType, c_name AS name, c_acctbal AS acctbal FROM customer
        |  UNION ALL
        |  SELECT 'Supplier' AS _NodeType, s_name AS name, s_acctbal AS acctbal FROM supplier) t
        |WHERE acctbal > 9000 ORDER BY _NodeType, name""".stripMargin) { (s, d) =>
      graft.graph.Views.nodeView(TpchGraph.provider(s, d),
        Seq("Customer", "Supplier"),
        Map(
          "name" -> Map("Customer" -> "c_name", "Supplier" -> "s_name"),
          "acctbal" -> Map("Customer" -> "c_acctbal", "Supplier" -> "s_acctbal")))
        .filter(col("acctbal") > 9000)
        .select("_NodeType", "name", "acctbal")
        .orderBy("_NodeType", "name")
    },

    // events-as-graph (FIXTURES User ext): per-user activity via the
    // did edge, with an edge-attr predicate on event type
    "q_match_user_events" -> QueryDef(
      """SELECT user_id, COUNT(*) AS cnt,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events WHERE event_type = 'purchase'
        |GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, d) =>
      val g = TpchGraph.provider(s, d)
      MatchPlanner.plan(g, MatchPattern(
        Seq(NodePat("u", "User"), NodePat("e", "Event")),
        Seq(EdgePat("u", "did", "e", attrEq = Map("etype" -> "purchase")))))
        .groupBy(graft.paths.PathExpand.localKey(col("u__GlobalNodeId"))
          .cast("long").as("user_id"))
        .agg(count(lit(1)).as("cnt"),
          sum(dec(col("u_did_e__value"))).cast(DoubleType).as("total_value"))
        .orderBy("user_id")
    },

    // two edges out of one alias (multi-edge source)
    "q_match_multi_edge" -> QueryDef(
      """SELECT c_custkey, n_name, o_orderkey
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN orders ON o_custkey = c_custkey
        |WHERE o_totalprice > 450000
        |ORDER BY c_custkey, o_orderkey""".stripMargin) { (s, d) =>
      val g = TpchGraph.provider(s, d)
      MatchPlanner.plan(g, MatchPattern(
        Seq(NodePat("c", "Customer"), NodePat("n", "Nation"),
          NodePat("o", "Order")),
        Seq(EdgePat("c", "locatedIn", "n"), EdgePat("c", "placed", "o"))))
        .filter(col("o__o_totalprice") > 450000)
        .select(col("c__c_custkey").as("c_custkey"),
          col("n__n_name").as("n_name"),
          col("o__o_orderkey").as("o_orderkey"))
        .orderBy("c_custkey", "o_orderkey")
    }
  )
}
