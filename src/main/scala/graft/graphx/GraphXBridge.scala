package graft.graphx

import graft.graph.GraphProvider
import org.apache.spark.HashPartitioner
import org.apache.spark.graphx.{Edge, Graph, VertexId}
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bridge from the adjacency-array node tables into GraphX for whole-
  * graph analytics (PageRank, connected components, …) — the analytics
  * half of the north star ("GraphX for graph analytics"). Vertices are
  * GlobalNodeIds (already globally unique across tables, §1.1); edges
  * explode straight out of the adjacency arrays with tombstones
  * filtered, so the bridge sees exactly what MATCH sees.
  */
object GraphXBridge {

  /** Built graphs, shared across ops: the r9/r10 shape rebuilt the
    * vertex/edge RDDs per analytic call, so running CC + PageRank +
    * SSSP over the same adjacency columns exploded the node tables
    * three times and re-partitioned three disjoint vertex RDDs. Keyed
    * by the edge selection plus the node-table DataFrame INSTANCES
    * (reference identity — the table caches behind [[GraphProvider]]s
    * hand out one instance per materialized table, so two providers
    * over the same data share the entry while different sfDirs with an
    * identical schema never collide). Entries hold cached RDDs sized by
    * the graph, not the corpus.
    *
    * LRU-bounded at [[MaxCachedGraphs]] with unpersist-on-evict (r12):
    * identity keying means a catalog DML that invalidates a node table
    * retires the old key FOREVER — the pre-r12 unbounded TrieMap kept
    * the stale entry's cached RDDs pinned in the block manager until an
    * explicit [[releaseGraphs]] that nothing called, so long sessions
    * interleaving mutations with CC/PageRank/SSSP grew memory without
    * bound. Four graphs comfortably covers the analytics-over-one-graph
    * sharing the cache exists for; an evicted graph is only ever
    * re-exploded, never wrong. [[releaseGraphs]] is additionally wired
    * into `GraphCatalog.clearData`/`dropGraph`, the two DDL points that
    * retire whole graphs at once.
    */
  val MaxCachedGraphs = 4

  private type GraphKey = (Seq[(String, String)], Seq[DataFrame])

  private def unpersistGraph(g: Graph[String, String]): Unit = {
    g.unpersistVertices(blocking = false)
    g.edges.unpersist(blocking = false)
  }

  /** access-ordered LinkedHashMap: eldest-by-use evicts (and unpersists)
    * once a 5th distinct graph lands; all access synchronized on the map
    */
  private val graphCache =
    new java.util.LinkedHashMap[GraphKey, Graph[String, String]](
      8, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[GraphKey, Graph[String, String]]): Boolean =
        if (size > MaxCachedGraphs) { unpersistGraph(e.getValue); true }
        else false
    }

  /** drop all shared graphs (unpersisting their RDDs) — called by the
    * whole-graph DDL (CLEAR DATA / DROP GRAPH) and available to long
    * sessions between workloads
    */
  def releaseGraphs(): Unit = graphCache.synchronized {
    graphCache.values.forEach(unpersistGraph(_))
    graphCache.clear()
  }

  /** Build (or reuse) a GraphX graph from selected (table, edge)
    * adjacency columns. Vertex attribute = table name; edge attribute =
    * edge name. The vertex RDD is explicitly hash-partitioned before
    * [[Graph]] construction — one deterministic partitioner that
    * GraphX's `VertexRDD` adopts, instead of whatever layout the
    * DataFrame scan produced — and the built graph is cached and shared
    * (see [[graphCache]]), so the four analytics over one graph pay the
    * explode + partition once.
    */
  def toGraphX(g: GraphProvider,
      edges: Seq[(String, String)]): Graph[String, String] = {
    val vertexTables = edges.flatMap { case (t, e) =>
      Seq(t, g.schema.table(t).edge(e).sinkTable)
    }.distinct
    val key: GraphKey = (edges, vertexTables.map(g.nodeTable))
    graphCache.synchronized {
      Option(graphCache.get(key)).getOrElse {
        val vertices: RDD[(VertexId, String)] = vertexTables.map { t =>
          g.nodeTable(t).select(col("GlobalNodeId"))
            .rdd.map(r => (r.getLong(0), t))
        }.reduce(_ union _)
        val edgeRdd: RDD[Edge[String]] = edges.map { case (t, en) =>
          val ed = g.schema.table(t).edge(en)
          g.nodeTable(t)
            .select(col("GlobalNodeId").as("src"),
              explode(col(ed.columnName)).as("e"),
              col(ed.delColumnName).as("del"))
            .filter(!array_contains(col("del"), col("e.edgeId")))
            .select(col("src"), col("e.sink"))
            .rdd.map(r => Edge(r.getLong(0), r.getLong(1), en))
        }.reduce(_ union _)
        val parts = math.max(vertices.getNumPartitions, 1)
        val built = Graph(
          vertices.partitionBy(new HashPartitioner(parts)), edgeRdd).cache()
        graphCache.put(key, built)
        built
      }
    }
  }

  /** connected components (undirected) → (GlobalNodeId, componentId) */
  def connectedComponents(g: GraphProvider,
      edges: Seq[(String, String)]): DataFrame = {
    val spark = g.nodeTable(g.schema.tables.head.name).sparkSession
    import spark.implicits._
    toGraphX(g, edges).connectedComponents()
      .vertices.toDF("GlobalNodeId", "component")
  }

  /** static PageRank → (GlobalNodeId, rank) */
  def pageRank(g: GraphProvider, edges: Seq[(String, String)],
      iterations: Int = 10, resetProb: Double = 0.15): DataFrame = {
    val spark = g.nodeTable(g.schema.tables.head.name).sparkSession
    import spark.implicits._
    toGraphX(g, edges).staticPageRank(iterations, resetProb)
      .vertices.toDF("GlobalNodeId", "rank")
  }

  /** Triangle counts per vertex over an arbitrary undirected edge list
    * (two long columns: src, dst) — typically a DERIVED graph: a
    * co-location clique, a near-dup pair graph. Edges are canonicalized
    * (self-loops dropped, src < dst, distinct) and vertex-cut
    * partitioned as GraphX's TriangleCount requires. Vertices that
    * appear in no edge are absent from the result.
    *
    * Runs `TriangleCount.runPreCanonicalized` directly: the edge list
    * is canonicalized HERE, so `TriangleCount.run`'s own
    * re-canonicalization would only rebuild the graph a second time —
    * and its final `outerJoinVertices` joins the rebuilt graph's
    * counters back across two unrelated vertex indexes (the
    * "Joining two VertexPartitions with different indexes is slow"
    * WARN the r9/r10 driver tails carried, an all-pairs index scan per
    * partition at scale). The pre-canonicalized path keeps one vertex
    * index end to end.
    */
  def triangleCounts(edges: DataFrame): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val canon = edges.toDF("src", "dst")
      .filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .distinct()
    org.apache.spark.graphx.lib.TriangleCount.runPreCanonicalized(
      Graph.fromEdgeTuples(
        canon.rdd.map(r => (r.getLong(0), r.getLong(1))),
        defaultValue = 0,
        uniqueEdges = Some(org.apache.spark.graphx.PartitionStrategy.RandomVertexCut)))
      .vertices.toDF("id", "triangles")
  }

  /** Single-source shortest hop-distances TO `landmark` following edge
    * direction (GraphX `ShortestPaths` Pregel) →
    * (GlobalNodeId, dist); vertices with no directed path to the
    * landmark are omitted.
    */
  def shortestPathsTo(g: GraphProvider, edges: Seq[(String, String)],
      landmark: Long): DataFrame = {
    val spark = g.nodeTable(g.schema.tables.head.name).sparkSession
    import spark.implicits._
    org.apache.spark.graphx.lib.ShortestPaths
      .run(toGraphX(g, edges), Seq(landmark))
      .vertices
      .flatMap { case (vid, spMap) => spMap.get(landmark).map(d => (vid, d)) }
      .toDF("GlobalNodeId", "dist")
  }
}
