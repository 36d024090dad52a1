package graft.graph

import graft.Tables
import graft.meta._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import org.apache.spark.sql.types._

import scala.collection.concurrent.TrieMap

/** Access to node tables + schema for the planner. */
trait GraphProvider {
  def schema: GraphSchema
  def nodeTable(name: String): DataFrame
}

/** The FIXTURES.md §B graph, built deterministically from the driver's
  * TPC-H-ish parquet tables. Node tables follow the reference layout:
  * GlobalNodeId (tableId<<48|key), properties, adjacency arrays with
  * tombstone + degree columns, reversed adjacency on sink tables.
  *
  * Built once per (session, sfDir) and persisted MEMORY_AND_DISK — the
  * equivalent of the reference's bulk load (`BulkInsert.cs`), after which
  * queries read the materialized graph.
  */
object TpchGraph {

  val schema: GraphSchema = GraphSchema(Seq(
    NodeTableDef("Region", 1, Some("r_regionkey"), Seq("r_name"), Nil),
    NodeTableDef("Nation", 2, Some("n_nationkey"), Seq("n_name"), Seq(
      EdgeDef("inRegion", "Nation", "Region"),
      // ring over nations within a region — gives the graph cycles for
      // var-length path tests (FIXTURES.md §B query 5)
      EdgeDef("next", "Nation", "Nation"))),
    NodeTableDef("Customer", 3, Some("c_custkey"),
      Seq("c_name", "c_acctbal", "c_mktsegment"), Seq(
        EdgeDef("locatedIn", "Customer", "Nation"),
        EdgeDef("placed", "Customer", "Order", Seq(
          EdgeAttr("totalprice", DoubleType), EdgeAttr("status", StringType))))),
    NodeTableDef("Supplier", 4, Some("s_suppkey"),
      Seq("s_name", "s_acctbal"), Seq(
        EdgeDef("locatedIn", "Supplier", "Nation"),
        EdgeDef("supplies", "Supplier", "Part", Seq(
          EdgeAttr("quantity", DoubleType))))),
    NodeTableDef("Part", 5, Some("p_partkey"),
      Seq("p_name", "p_brand", "p_type", "p_size", "p_retailprice"), Nil),
    NodeTableDef("Order", 6, Some("o_orderkey"),
      Seq("o_orderstatus", "o_totalprice", "o_orderdate"), Seq(
        EdgeDef("contains", "Order", "Part", Seq(
          EdgeAttr("quantity", DoubleType),
          EdgeAttr("extendedprice", DoubleType),
          EdgeAttr("discount", DoubleType))))),
    // FIXTURES.md §B "User (ext)": the events stream as a graph —
    // distinct users with `did` edges onto per-event nodes (the batch
    // shape the streaming ingestion extension appends to)
    NodeTableDef("User", 7, Some("user_id"), Nil, Seq(
      EdgeDef("did", "User", "Event", Seq(
        EdgeAttr("etype", StringType), EdgeAttr("value", DoubleType))))),
    NodeTableDef("Event", 8, Some("event_id"),
      Seq("event_type", "value"), Nil)))

  private val cache = TrieMap[String, Map[String, DataFrame]]()

  // staged edge-pair DataFrames per sfDir, persisted for the duration of
  // the build (each list feeds a forward and a reversed adjacency);
  // released once the node tables have materialized so the process
  // doesn't pin O(edges) of staging cache for its lifetime
  private val staged = TrieMap[String, Seq[DataFrame]]()

  /** Unpersist the staged edge-pair cache for `sfDir`. Safe to call any
    * time: the node tables are themselves persisted, so once they have
    * materialized the staging cache is dead weight; before that, a
    * release merely recomputes the pair projection on first use. Bench
    * calls this right after the bulk-load materializes.
    */
  def releaseStaging(sfDir: String): Unit =
    staged.remove(sfDir).foreach(_.foreach(_.unpersist(false)))

  def provider(spark: SparkSession, sfDir: String): GraphProvider =
    new GraphProvider {
      val schema: GraphSchema = TpchGraph.schema
      def nodeTable(name: String): DataFrame = tables(spark, sfDir)(name)
    }

  def tables(spark: SparkSession, sfDir: String): Map[String, DataFrame] =
    cache.getOrElseUpdate(sfDir, build(spark, sfDir))

  private def g(t: Int, c: String) = GraphBuilder.gid(t, col(c))

  private def build(spark: SparkSession, sfDir: String): Map[String, DataFrame] = {
    def t(n: String) = Tables.load(spark, sfDir, n)
    val region = t("region"); val nation = t("nation")
    val customer = t("customer"); val supplier = t("supplier")
    val part = t("part"); val orders = t("orders"); val lineitem = t("lineitem")
    val events = t("events")

    // --- edge pair DataFrames (src gid, sink gid, attrs) ---
    val inRegion = nation.select(
      g(2, "n_nationkey").as("src"), g(1, "n_regionkey").as("sink"))

    val ringW = Window.partitionBy("n_regionkey").orderBy("n_nationkey")
    val nextEdge = nation.select(
      g(2, "n_nationkey").as("src"),
      GraphBuilder.gid(2,
        coalesce(lead(col("n_nationkey"), 1).over(ringW),
          first(col("n_nationkey")).over(
            ringW.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))))
        .as("sink"))

    val custLocated = customer.select(
      g(3, "c_custkey").as("src"), g(2, "c_nationkey").as("sink"))
    val placed = orders.select(
      g(3, "o_custkey").as("src"), g(6, "o_orderkey").as("sink"),
      col("o_totalprice").as("totalprice"), col("o_orderstatus").as("status"))
    val suppLocated = supplier.select(
      g(4, "s_suppkey").as("src"), g(2, "s_nationkey").as("sink"))
    // distinct (supplier, part) with exact-decimal summed quantity
    val supplies = lineitem
      .groupBy("l_suppkey", "l_partkey")
      .agg(sum(col("l_quantity").cast(DecimalType(18, 2)))
        .cast(DoubleType).as("quantity"))
      .select(g(4, "l_suppkey").as("src"), g(5, "l_partkey").as("sink"),
        col("quantity"))
    val contains = lineitem.select(
      g(6, "l_orderkey").as("src"), g(5, "l_partkey").as("sink"),
      col("l_quantity").as("quantity"),
      col("l_extendedprice").as("extendedprice"),
      col("l_discount").as("discount"))

    val did = events.select(
      g(7, "user_id").as("src"), g(8, "event_id").as("sink"),
      col("event_type").as("etype"), col("value").as("value"))

    // each edge list is consumed twice (forward adjacency on the source
    // table, reversed mirror on the sink) — persist it so derivations
    // like the supplies pre-aggregation over lineitem compute once and
    // the second side reads the cache (lazy, so the 8 table builds
    // still materialize concurrently). Edge staging before the build is
    // the standard bulk-load shape; the materialized list is O(edges),
    // small next to the build shuffles it feeds.
    val pairs: Map[(String, String), DataFrame] = Map(
      ("User", "did") -> did,
      ("Nation", "inRegion") -> inRegion,
      ("Nation", "next") -> nextEdge,
      ("Customer", "locatedIn") -> custLocated,
      ("Customer", "placed") -> placed,
      ("Supplier", "locatedIn") -> suppLocated,
      ("Supplier", "supplies") -> supplies,
      ("Order", "contains") -> contains)
      .map { case (k, v) => k -> v.persist(StorageLevel.MEMORY_AND_DISK) }
    staged.put(sfDir, pairs.values.toSeq)

    val bases = Map(
      "Region" -> ("r_regionkey", region),
      "Nation" -> ("n_nationkey", nation),
      "Customer" -> ("c_custkey", customer),
      "Supplier" -> ("s_suppkey", supplier),
      "Part" -> ("p_partkey", part),
      "Order" -> ("o_orderkey",
        orders.select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate")),
      "User" -> ("user_id", events.select("user_id").distinct()),
      "Event" -> ("event_id",
        events.select("event_id", "event_type", "value")))

    // hub-prone tables (per-user event fan-out) build with the salted
    // two-phase adjacency aggregation; the TPC-H dimension/fact edges
    // have bounded degree and keep the single-shuffle path
    val saltOf = Map("User" -> 8).withDefaultValue(1)

    schema.tables.map { td =>
      val (key, base) = bases(td.name)
      val incoming = schema.incomingEdges(td.name)
        .map(e => e -> pairs((e.sourceTable, e.name)))
      val df = GraphBuilder.nodeTable(
        td, base, key,
        td.edges.map(e => e.name -> pairs((td.name, e.name))).toMap,
        incoming, saltFactor = saltOf(td.name))
        .persist(StorageLevel.MEMORY_AND_DISK)
      td.name -> df
    }.toMap
  }
}
