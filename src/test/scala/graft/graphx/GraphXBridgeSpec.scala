package graft.graphx

import graft.SparkSpec
import graft.graph.{GraphBuilder, GraphProvider}
import graft.meta._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Lifecycle of the shared graph cache: LRU-bounded at
  * [[GraphXBridge.MaxCachedGraphs]], evicted graphs' RDDs unpersisted
  * (the pre-r12 unbounded cache pinned stale entries' cached RDDs in the
  * block manager forever once a DML retired their identity key).
  */
class GraphXBridgeSpec extends SparkSpec {

  /** a fresh micro-provider per call: the cache keys on node-table
    * DataFrame identity, so every build is a distinct graph
    */
  private def provider(): GraphProvider = {
    val s = spark
    import s.implicits._
    val schema = GraphSchema(Seq(
      NodeTableDef("People", 1, Some("id"), Seq("name"), Seq(
        EdgeDef("Knows", "People", "People")))))
    val people = Seq((1, "Alice"), (2, "Bob"), (3, "Caven"))
      .toDF("id", "name")
    val knows = Seq((1, 2), (2, 3)).toDF("s", "t")
      .select(GraphBuilder.gid(1, col("s")).as("src"),
        GraphBuilder.gid(1, col("t")).as("sink"))
    val table = GraphBuilder.nodeTable(
      schema.table("People"), people, "id",
      Map("Knows" -> knows),
      Seq(schema.table("People").edge("Knows") -> knows)).cache()
    val sc = schema
    new GraphProvider {
      val schema: GraphSchema = sc
      def nodeTable(name: String): DataFrame = { require(name == "People"); table }
    }
  }

  private def cached(g: org.apache.spark.graphx.Graph[String, String]) =
    g.vertices.getStorageLevel != StorageLevel.NONE &&
      g.edges.getStorageLevel != StorageLevel.NONE

  private val edgeSel = Seq(("People", "Knows"))

  test("cache hit: same provider returns the same graph instance") {
    GraphXBridge.releaseGraphs()
    val g = provider()
    val first = GraphXBridge.toGraphX(g, edgeSel)
    assert(GraphXBridge.toGraphX(g, edgeSel) eq first)
    assert(cached(first))
    GraphXBridge.releaseGraphs()
    assert(!cached(first), "releaseGraphs must unpersist")
  }

  test("building past the bound evicts (and unpersists) the LRU graph") {
    GraphXBridge.releaseGraphs()
    val graphs = (0 until GraphXBridge.MaxCachedGraphs + 2)
      .map(_ => GraphXBridge.toGraphX(provider(), edgeSel))
    // two over the bound: the two eldest are out and unpersisted, the
    // most recent MaxCachedGraphs are still live
    assert(graphs.take(2).forall(g => !cached(g)),
      "evicted graphs must have their RDDs unpersisted")
    assert(graphs.drop(2).forall(cached),
      "graphs inside the bound must stay cached")
    GraphXBridge.releaseGraphs()
  }

  test("eviction order is least-recently-USED, not least-recently-built") {
    GraphXBridge.releaseGraphs()
    val pa = provider()
    val first = GraphXBridge.toGraphX(pa, edgeSel)
    val rest = (1 until GraphXBridge.MaxCachedGraphs)
      .map(_ => GraphXBridge.toGraphX(provider(), edgeSel))
    // touch the eldest, then overflow by one: the SECOND-built graph is
    // now the LRU entry and must be the one evicted
    GraphXBridge.toGraphX(pa, edgeSel)
    GraphXBridge.toGraphX(provider(), edgeSel)
    assert(cached(first), "a just-touched graph must survive eviction")
    assert(!cached(rest.head), "the least-recently-used graph evicts")
    assert(rest.tail.forall(cached))
    GraphXBridge.releaseGraphs()
  }
}
