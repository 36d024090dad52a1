package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The relational (T-SQL-subset) surface of the reference — the W* AST it
  * parses and delegates to SQL Server (SURVEY.md §2.2, §2.3, §2.6, §2.7,
  * §2.8). In Spark every one of these is a built-in; each query below
  * exercises one construct over the driver's parquet tables and carries a
  * DuckDB oracle.
  *
  * Hash-safety conventions (driver compares sorted-column value hashes):
  *  - money aggregates go through DECIMAL(18,2) so the sum is exact and
  *    order-independent on both engines, then cast to DOUBLE;
  *  - every query ends in a total ORDER BY;
  *  - integer-ish outputs are cast so Spark and DuckDB agree on width
  *    (DuckDB LENGTH/ROW_NUMBER yield BIGINT → Spark side casts to long).
  */
object Relational {

  private def dec(c: Column): Column = c.cast(DecimalType(18, 2))

  val defs: Map[String, QueryDef] = QueryDef.checked(

    // §2.1 scan + §2.2 projection/filter (predicate+projection pushdown to parquet)
    "q_scan_filter_project" -> QueryDef(
      """SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
        |FROM lineitem WHERE l_returnflag = 'R' AND l_quantity >= 30
        |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, d) =>
      Tables.load(s, d, "lineitem")
        .filter(col("l_returnflag") === "R" && col("l_quantity") >= 30)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
        .orderBy("l_orderkey", "l_linenumber")
    },

    // §2.6 GROUP BY + scalar aggregates (TPC-H Q1 shape)
    "q_agg_groupby" -> QueryDef(
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
        |  COUNT(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, d) =>
      Tables.load(s, d, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(dec(col("l_quantity"))).cast(DoubleType).as("sum_qty"),
          sum(dec(col("l_extendedprice"))).cast(DoubleType).as("sum_base"),
          sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
            .cast(DoubleType).as("sum_disc_price"),
          (sum(dec(col("l_quantity"))).cast(DoubleType) / count(lit(1))).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    // §2.2 predicate language: BETWEEN / IN / LIKE
    "q_filter_pred" -> QueryDef(
      """SELECT o_orderkey, o_totalprice, o_orderpriority
        |FROM orders
        |WHERE o_totalprice BETWEEN 100000 AND 200000
        |  AND o_orderpriority IN ('1-URGENT', '2-HIGH')
        |  AND o_orderstatus LIKE 'F%'
        |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      Tables.load(s, d, "orders")
        .filter(col("o_totalprice").between(100000, 200000)
          && col("o_orderpriority").isin("1-URGENT", "2-HIGH")
          && col("o_orderstatus").like("F%"))
        .select("o_orderkey", "o_totalprice", "o_orderpriority")
        .orderBy("o_orderkey")
    },

    // §2.3 qualified inner join chain (dimension joins → broadcast at scale)
    "q_join_inner" -> QueryDef(
      """SELECT c_custkey, c_name, n_name, r_name
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |ORDER BY c_custkey""".stripMargin) { (s, d) =>
      Tables.load(s, d, "customer")
        .join(broadcast(Tables.load(s, d, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.load(s, d, "region")),
          col("n_regionkey") === col("r_regionkey"))
        .select("c_custkey", "c_name", "n_name", "r_name")
        .orderBy("c_custkey")
    },

    // §2.3 outer join
    "q_join_left_outer" -> QueryDef(
      """SELECT c_custkey, COUNT(o_orderkey) AS order_cnt
        |FROM customer LEFT JOIN orders ON o_custkey = c_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin) { (s, d) =>
      Tables.load(s, d, "customer")
        .join(Tables.load(s, d, "orders"),
          col("o_custkey") === col("c_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("order_cnt"))
        .orderBy("c_custkey")
    },

    // §2.3 FULL OUTER join — both sides filtered so left-only and
    // right-only rows actually occur; keys coalesced so the output
    // carries no NULL sort keys
    "q_join_full_outer" -> QueryDef(
      """WITH c AS (SELECT * FROM customer WHERE c_acctbal < 0),
        |     o AS (SELECT * FROM orders WHERE o_totalprice > 300000)
        |SELECT COALESCE(c_custkey, o_custkey) AS custkey,
        |       CASE WHEN c_custkey IS NULL THEN 'right_only'
        |            WHEN o_custkey IS NULL THEN 'left_only'
        |            ELSE 'both' END AS side,
        |       COUNT(*) AS cnt
        |FROM c FULL JOIN o ON o_custkey = c_custkey
        |GROUP BY 1, 2 ORDER BY custkey, side""".stripMargin) { (s, d) =>
      Tables.load(s, d, "customer").filter(col("c_acctbal") < 0)
        .join(Tables.load(s, d, "orders").filter(col("o_totalprice") > 300000),
          col("o_custkey") === col("c_custkey"), "full_outer")
        .select(
          coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
          when(col("c_custkey").isNull, "right_only")
            .when(col("o_custkey").isNull, "left_only")
            .otherwise("both").as("side"))
        .groupBy("custkey", "side")
        .agg(count(lit(1)).as("cnt"))
        .orderBy("custkey", "side")
    },

    // §2.6 GROUPING SETS (generalizes the reference's GROUP BY; ROLLUP
    // and CUBE are its fixed instances) — group keys coalesced to a
    // sentinel so subtotal rows carry no NULL hash keys
    "q_grouping_sets" -> QueryDef(
      """SELECT COALESCE(l_returnflag, 'ALL') AS rf,
        |       COALESCE(l_linestatus, 'ALL') AS ls,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |       COUNT(*) AS cnt
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        |ORDER BY rf, ls""".stripMargin) { (s, d) =>
      Tables.load(s, d, "lineitem")
        .groupingSets(
          Seq(Seq(col("l_returnflag"), col("l_linestatus")),
            Seq(col("l_returnflag")), Seq()),
          col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(dec(col("l_quantity"))).cast(DoubleType).as("sum_qty"),
          count(lit(1)).as("cnt"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
          col("sum_qty"), col("cnt"))
        .orderBy("rf", "ls")
    },

    // §2.6 PIVOT — values declared up front (no distinct-value job at
    // scale); oracle is the conditional-aggregation expansion
    "q_pivot" -> QueryDef(
      """SELECT l_returnflag,
        |  CAST(SUM(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS "F",
        |  CAST(SUM(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS "O"
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      Tables.load(s, d, "lineitem")
        .groupBy("l_returnflag")
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(sum(dec(col("l_quantity"))).cast(DoubleType))
        .orderBy("l_returnflag")
    },

    // §2.2 EXISTS → left-semi join
    "q_semi_exists" -> QueryDef(
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_totalprice > 300000)
        |ORDER BY c_custkey""".stripMargin) { (s, d) =>
      Tables.load(s, d, "customer")
        .join(Tables.load(s, d, "orders").filter(col("o_totalprice") > 300000),
          col("o_custkey") === col("c_custkey"), "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    },

    // §2.2 NOT EXISTS → left-anti join
    "q_anti_not_exists" -> QueryDef(
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_totalprice > 300000)
        |ORDER BY c_custkey""".stripMargin) { (s, d) =>
      Tables.load(s, d, "customer")
        .join(Tables.load(s, d, "orders").filter(col("o_totalprice") > 300000),
          col("o_custkey") === col("c_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    },

    // §2.7 TOP n + ORDER BY (deterministic tiebreak)
    "q_top_k" -> QueryDef(
      """SELECT c_custkey, c_name, c_acctbal FROM customer
        |ORDER BY c_acctbal DESC, c_custkey LIMIT 10""".stripMargin) { (s, d) =>
      Tables.load(s, d, "customer")
        .select("c_custkey", "c_name", "c_acctbal")
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
        .limit(10)
    },

    // §2.7 TOP n WITH TIES ≡ RANK() <= n — cutoff-key shape (TakeOrdered
    // for the k-th key, then filter), no single-partition window
    "q_top_ties" -> QueryDef(
      """SELECT c_custkey, c_acctbal FROM (
        |  SELECT c_custkey, c_acctbal,
        |         RANK() OVER (ORDER BY c_acctbal DESC) AS rk
        |  FROM customer) t
        |WHERE rk <= 10 ORDER BY c_custkey""".stripMargin) { (s, d) =>
      val c = Tables.load(s, d, "customer").select("c_custkey", "c_acctbal")
      graft.ext.TiesCutoff.topWithTies(c, Seq((col("c_acctbal"), true)), 10)
        .orderBy("c_custkey")
    },

    // §2.7 UNION ALL
    "q_union_all" -> QueryDef(
      """SELECT c_name AS name, c_acctbal AS acctbal, 'customer' AS kind FROM customer
        |UNION ALL
        |SELECT s_name AS name, s_acctbal AS acctbal, 'supplier' AS kind FROM supplier
        |ORDER BY kind, name""".stripMargin) { (s, d) =>
      val c = Tables.load(s, d, "customer")
        .select(col("c_name").as("name"), col("c_acctbal").as("acctbal"),
          lit("customer").as("kind"))
      val sup = Tables.load(s, d, "supplier")
        .select(col("s_name").as("name"), col("s_acctbal").as("acctbal"),
          lit("supplier").as("kind"))
      c.unionAll(sup).orderBy("kind", "name")
    },

    // §2.7 EXCEPT (distinct semantics on both engines): never-ordered customers
    "q_except" -> QueryDef(
      """SELECT c_custkey AS custkey FROM customer
        |EXCEPT
        |SELECT o_custkey AS custkey FROM orders
        |ORDER BY custkey""".stripMargin) { (s, d) =>
      Tables.load(s, d, "customer").select(col("c_custkey").as("custkey"))
        .except(Tables.load(s, d, "orders").select(col("o_custkey").as("custkey")))
        .orderBy("custkey")
    },

    // §2.7 INTERSECT
    "q_intersect" -> QueryDef(
      """SELECT c_nationkey AS nationkey FROM customer
        |INTERSECT
        |SELECT s_nationkey AS nationkey FROM supplier
        |ORDER BY nationkey""".stripMargin) { (s, d) =>
      Tables.load(s, d, "customer").select(col("c_nationkey").as("nationkey"))
        .intersect(Tables.load(s, d, "supplier").select(col("s_nationkey").as("nationkey")))
        .orderBy("nationkey")
    },

    // §2.8 CASE (searched) + CAST
    "q_case_expr" -> QueryDef(
      """SELECT o_orderkey,
        |  CASE WHEN o_totalprice < 100000 THEN 'small'
        |       WHEN o_totalprice < 250000 THEN 'medium'
        |       ELSE 'large' END AS bucket
        |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      Tables.load(s, d, "orders")
        .select(col("o_orderkey"),
          when(col("o_totalprice") < 100000, "small")
            .when(col("o_totalprice") < 250000, "medium")
            .otherwise("large").as("bucket"))
        .orderBy("o_orderkey")
    },

    // §2.6 DISTINCT
    "q_distinct" -> QueryDef(
      "SELECT DISTINCT c_mktsegment AS segment FROM customer ORDER BY segment") {
      (s, d) =>
        Tables.load(s, d, "customer")
          .select(col("c_mktsegment").as("segment"))
          .distinct()
          .orderBy("segment")
    },

    // §2.6 HAVING
    "q_having" -> QueryDef(
      """SELECT c_nationkey, COUNT(*) AS cnt FROM customer
        |GROUP BY c_nationkey HAVING COUNT(*) > 50
        |ORDER BY c_nationkey""".stripMargin) { (s, d) =>
      Tables.load(s, d, "customer")
        .groupBy("c_nationkey")
        .agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") > 50)
        .orderBy("c_nationkey")
    },

    // §2.8 scalar subquery (exact-decimal threshold so both engines agree)
    "q_scalar_subquery" -> QueryDef(
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_totalprice > (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) FROM orders)
        |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      val o = Tables.load(s, d, "orders")
      // the scalar lives in the plan (broadcast single-row join), not a
      // driver round-trip — one Spark job end to end
      val avg = o.agg(
        (sum(dec(col("o_totalprice"))).cast(DoubleType) / count(lit(1))).as("__avg"))
      o.crossJoin(broadcast(avg))
        .filter(col("o_totalprice") > col("__avg"))
        .select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey")
    },

    // §2.7-adjacent: window ranking (beyond-reference; free in Spark)
    "q_window_rank" -> QueryDef(
      """SELECT c_custkey, c_nationkey, c_acctbal, CAST(rn AS BIGINT) AS rn FROM (
        |  SELECT c_custkey, c_nationkey, c_acctbal,
        |         ROW_NUMBER() OVER (PARTITION BY c_nationkey
        |                            ORDER BY c_acctbal DESC, c_custkey) AS rn
        |  FROM customer) t
        |WHERE rn <= 3 ORDER BY c_nationkey, rn""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("c_nationkey")
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
      Tables.load(s, d, "customer")
        .withColumn("rn", row_number().over(w).cast(LongType))
        .filter(col("rn") <= 3)
        .select("c_custkey", "c_nationkey", "c_acctbal", "rn")
        .orderBy("c_nationkey", "rn")
    },

    // offset window functions (LAG/LEAD/FIRST_VALUE) — partitioned by
    // user_id, so the window exchange hash-distributes; no global window
    "q_window_lag_lead" -> QueryDef(
      """SELECT user_id, event_id,
        |  LAG(value, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value,
        |  LEAD(value, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_value,
        |  FIRST_VALUE(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_event
        |FROM events ORDER BY user_id, event_id""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      Tables.load(s, d, "events")
        .select(col("user_id"), col("event_id"),
          lag(col("value"), 1).over(w).as("prev_value"),
          lead(col("value"), 1).over(w).as("next_value"),
          first(col("event_id")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .as("first_event"))
        .orderBy("user_id", "event_id")
    },

    // NTILE — equal-height buckets inside each hash-distributed partition
    "q_window_ntile" -> QueryDef(
      """SELECT user_id, event_id,
        |  CAST(NTILE(4) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |       AS INTEGER) AS quartile
        |FROM events ORDER BY user_id, event_id""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      Tables.load(s, d, "events")
        .select(col("user_id"), col("event_id"),
          ntile(4).over(w).cast(IntegerType).as("quartile"))
        .orderBy("user_id", "event_id")
    },

    // window running aggregate (ROWS frame; exact decimal running sum)
    "q_window_running_sum" -> QueryDef(
      """SELECT user_id, event_id,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value
        |FROM events
        |ORDER BY user_id, event_id""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.load(s, d, "events")
        .select(col("user_id"), col("event_id"),
          sum(dec(col("value"))).over(w).cast(DoubleType).as("running_value"))
        .orderBy("user_id", "event_id")
    },

    // §2.7 CTE (WITH) — revenue per nation
    "q_cte" -> QueryDef(
      """WITH rev AS (
        |  SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS r
        |  FROM orders GROUP BY o_custkey)
        |SELECT n_name, CAST(SUM(r) AS DOUBLE) AS revenue
        |FROM rev
        |JOIN customer ON c_custkey = o_custkey
        |JOIN nation ON n_nationkey = c_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin) { (s, d) =>
      val rev = Tables.load(s, d, "orders")
        .groupBy("o_custkey")
        .agg(sum(dec(col("o_totalprice"))).as("r"))
      rev.join(Tables.load(s, d, "customer"), col("c_custkey") === col("o_custkey"))
        .join(broadcast(Tables.load(s, d, "nation")),
          col("n_nationkey") === col("c_nationkey"))
        .groupBy("n_name")
        .agg(sum(col("r")).cast(DoubleType).as("revenue"))
        .orderBy("n_name")
    },

    // §2.6 ROLLUP (beyond-reference grouping sets; free in Spark)
    "q_rollup" -> QueryDef(
      """SELECT COALESCE(l_returnflag, 'ALL') AS flag,
        |       COALESCE(l_linestatus, 'ALL') AS status,
        |       COUNT(*) AS cnt
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY flag, status""".stripMargin) { (s, d) =>
      Tables.load(s, d, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("cnt"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("status"), col("cnt"))
        .orderBy("flag", "status")
    },

    // §2.6 CUBE
    "q_cube" -> QueryDef(
      """SELECT COALESCE(o_orderstatus, 'ALL') AS status,
        |       COALESCE(o_orderpriority, 'ALL') AS priority,
        |       COUNT(*) AS cnt
        |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY status, priority""".stripMargin) { (s, d) =>
      Tables.load(s, d, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("cnt"))
        .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"), col("cnt"))
        .orderBy("status", "priority")
    },

    // §2.3 implicit cross join (comma list in reference FROM)
    "q_cross_join" -> QueryDef(
      """SELECT r1.r_name AS a, r2.r_name AS b
        |FROM region r1 CROSS JOIN region r2 ORDER BY a, b""".stripMargin) { (s, d) =>
      val r = Tables.load(s, d, "region")
      r.select(col("r_name").as("a"))
        .crossJoin(r.select(col("r_name").as("b")))
        .orderBy("a", "b")
    },

    // §2.8 string function surface
    "q_string_funcs" -> QueryDef(
      """SELECT p_partkey, UPPER(p_brand) AS brand_u,
        |  SUBSTRING(p_name, 1, 10) AS name10,
        |  p_brand || ':' || p_type AS bt,
        |  CAST(LENGTH(p_name) AS BIGINT) AS name_len
        |FROM part ORDER BY p_partkey""".stripMargin) { (s, d) =>
      Tables.load(s, d, "part")
        .select(col("p_partkey"),
          upper(col("p_brand")).as("brand_u"),
          substring(col("p_name"), 1, 10).as("name10"),
          concat(col("p_brand"), lit(":"), col("p_type")).as("bt"),
          length(col("p_name")).cast(LongType).as("name_len"))
        .orderBy("p_partkey")
    },

    // §2.8 date/time extraction
    "q_date_funcs" -> QueryDef(
      """SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS yr,
        |       CAST(EXTRACT(MONTH FROM o_orderdate) AS INTEGER) AS mon,
        |       COUNT(*) AS cnt
        |FROM orders GROUP BY 1, 2 ORDER BY yr, mon""".stripMargin) { (s, d) =>
      Tables.load(s, d, "orders")
        .groupBy(year(col("o_orderdate")).as("yr"),
          month(col("o_orderdate")).as("mon"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy("yr", "mon")
    },

    // §2.8 arithmetic operators (exact decimal product)
    "q_arith_expr" -> QueryDef(
      """SELECT l_orderkey, l_linenumber,
        |  CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_tax AS DECIMAL(18,2)) AS DOUBLE) AS tax_amt,
        |  l_linenumber % 3 AS m3
        |FROM lineitem WHERE l_orderkey <= 1000
        |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, d) =>
      Tables.load(s, d, "lineitem")
        .filter(col("l_orderkey") <= 1000)
        .select(col("l_orderkey"), col("l_linenumber"),
          (dec(col("l_extendedprice")) * dec(col("l_tax")))
            .cast(DoubleType).as("tax_amt"),
          (col("l_linenumber") % 3).as("m3"))
        .orderBy("l_orderkey", "l_linenumber")
    },

    // §2.2 IS NULL over outer-join nulls
    "q_is_null" -> QueryDef(
      """SELECT c_custkey FROM customer
        |LEFT JOIN (SELECT DISTINCT o_custkey FROM orders
        |           WHERE o_orderstatus = 'F') f ON f.o_custkey = c_custkey
        |WHERE f.o_custkey IS NULL ORDER BY c_custkey""".stripMargin) { (s, d) =>
      val f = Tables.load(s, d, "orders")
        .filter(col("o_orderstatus") === "F")
        .select("o_custkey").distinct()
      Tables.load(s, d, "customer")
        .join(f, col("o_custkey") === col("c_custkey"), "left_outer")
        .filter(col("o_custkey").isNull)
        .select("c_custkey")
        .orderBy("c_custkey")
    },

    // §2.6 COUNT(DISTINCT) (the reference delegates DISTINCT aggregation)
    "q_count_distinct" -> QueryDef(
      """SELECT COUNT(DISTINCT l_partkey) AS parts,
        |       COUNT(DISTINCT l_suppkey) AS supps
        |FROM lineitem""".stripMargin) { (s, d) =>
      Tables.load(s, d, "lineitem")
        .agg(countDistinct(col("l_partkey")).as("parts"),
          countDistinct(col("l_suppkey")).as("supps"))
    },

    // §2.6 approximate NDV (HLL; stats-collector building block) — not
    // DuckDB-reproducible bit-for-bit → rows-only check
    // deterministic check: emit the exact NDV plus a boolean asserting the
    // HLL estimate landed inside its error bound — the oracle states the
    // exact count and expects the bound to hold (rsd 0.05 → ~3σ at 15%)
    "q_approx_distinct" -> QueryDef(
      """SELECT COUNT(DISTINCT l_partkey) AS exact_parts, TRUE AS approx_ok
        |FROM lineitem""".stripMargin) { (s, d) =>
      Tables.load(s, d, "lineitem")
        .agg(countDistinct(col("l_partkey")).as("exact_parts"),
          approx_count_distinct(col("l_partkey"), rsd = 0.05).as("__approx"))
        .select(col("exact_parts"),
          (abs(col("__approx") - col("exact_parts")) <=
            col("exact_parts") * 0.15).as("approx_ok"))
    },

    // §2.6 exact interpolated percentiles (continuous quantile) — both
    // engines use the same linear-interpolation definition
    "q_percentile" -> QueryDef(
      """SELECT o_orderstatus AS status,
        |  ROUND(quantile_cont(o_totalprice, 0.5), 4) AS p50,
        |  ROUND(quantile_cont(o_totalprice, 0.9), 4) AS p90
        |FROM orders GROUP BY status ORDER BY status""".stripMargin) { (s, d) =>
      Tables.load(s, d, "orders")
        .groupBy(col("o_orderstatus").as("status"))
        .agg(round(expr("percentile(o_totalprice, 0.5)"), 4).as("p50"),
          round(expr("percentile(o_totalprice, 0.9)"), 4).as("p90"))
        .orderBy("status")
    },

    // sketch-based approximate percentile: the oracle states the exact
    // quantile and expects the estimate inside a 5% band (same pattern
    // as q_approx_distinct)
    "q_approx_percentile" -> QueryDef(
      """SELECT ROUND(quantile_cont(o_totalprice, 0.5), 4) AS exact_p50,
        |  TRUE AS approx_ok
        |FROM orders""".stripMargin) { (s, d) =>
      Tables.load(s, d, "orders")
        .agg(expr("percentile(o_totalprice, 0.5)").as("__exact"),
          expr("percentile_approx(o_totalprice, 0.5, 1000)").as("__approx"))
        .select(round(col("__exact"), 4).as("exact_p50"),
          (abs(col("__approx") - col("__exact")) <=
            col("__exact") * 0.05).as("approx_ok"))
    },

    // §2.7 TOP n PERCENT — ROW_NUMBER over the total order (acctbal DESC,
    // custkey) <= ceil(n%) IS the ordered top-k, so count + TakeOrdered
    // replaces the unpartitioned COUNT(*)/ROW_NUMBER() windows
    "q_top_percent" -> QueryDef(
      """WITH t AS (SELECT c_custkey, c_acctbal,
        |             ROW_NUMBER() OVER (ORDER BY c_acctbal DESC, c_custkey) AS rn,
        |             COUNT(*) OVER () AS n
        |           FROM customer)
        |SELECT c_custkey, c_acctbal FROM t
        |WHERE rn <= CEIL(n * 0.01) ORDER BY c_custkey""".stripMargin) { (s, d) =>
      val c = Tables.load(s, d, "customer").select("c_custkey", "c_acctbal")
      val k = math.ceil(c.count() * 0.01).toInt
      c.orderBy(col("c_acctbal").desc, col("c_custkey")).limit(k)
        .orderBy("c_custkey")
    },

    // §2.7 INTERSECT ALL (bag semantics)
    "q_intersect_all" -> QueryDef(
      """SELECT c_nationkey AS nationkey FROM customer
        |INTERSECT ALL
        |SELECT s_nationkey AS nationkey FROM supplier
        |ORDER BY nationkey""".stripMargin) { (s, d) =>
      Tables.load(s, d, "customer").select(col("c_nationkey").as("nationkey"))
        .intersectAll(
          Tables.load(s, d, "supplier").select(col("s_nationkey").as("nationkey")))
        .orderBy("nationkey")
    },

    // §2.1 derived table + §2.6 aggregate over it
    "q_derived_table" -> QueryDef(
      """SELECT big.o_custkey, COUNT(*) AS big_orders
        |FROM (SELECT o_custkey FROM orders WHERE o_totalprice > 200000) big
        |GROUP BY big.o_custkey ORDER BY big.o_custkey""".stripMargin) { (s, d) =>
      Tables.load(s, d, "orders")
        .filter(col("o_totalprice") > 200000)
        .select("o_custkey")
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("big_orders"))
        .orderBy("o_custkey")
    }
  )
}
