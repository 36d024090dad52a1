package graft.stats

import graft.graph.GraphProvider
import org.apache.spark.sql.functions._

/** Graph statistics for the pattern-join cost model — the Spark analogue
  * of the reference's sampling tables + average-degree catalog
  * (`GraphViewConnection.cs:2887-2976`, SURVEY §4.4). One aggregation per
  * node table collects row counts and per-edge average out-degrees;
  * reversed degree = edgeCount / sinkRows. Collected once per graph
  * ("ANALYZE GRAPH") and cached; at 100 TB this job is a metadata-scale
  * pass (map + single-row agg per table) and would persist into the
  * graph_meta catalog.
  */
final case class EdgeStat(count: Long, avgDeg: Double, avgRevDeg: Double)

final case class GraphStats(
    rows: Map[String, Long],
    edges: Map[(String, String), EdgeStat],
    /** per-(table,edge) histogram of sampled sink ids (§4.4) */
    sinkHists: Map[(String, String), Histogram] = Map.empty,
    /** per-(table,edge) histogram of sampled SOURCE ids (one entry per
      * live edge) — the reversed-expansion mirror of [[sinkHists]]:
      * where the edges' source endpoints sit in the id domain
      */
    srcHists: Map[(String, String), Histogram] = Map.empty,
    /** per-table histogram of sampled GlobalNodeIds */
    idHists: Map[String, Histogram] = Map.empty,
    /** per-table LocalRelation-backed row sample (the reference's
      * `_Sampling` tables): plan-time predicate-selectivity probes run
      * against these ~200 driver-local rows, never the base table
      */
    samples: Map[String, org.apache.spark.sql.DataFrame] = Map.empty) {

  def tableRows(t: String): Double = rows.getOrElse(t, 1000L).toDouble

  def edgeStat(table: String, edge: String): EdgeStat =
    edges.getOrElse((table, edge),
      EdgeStat(0L, GraphStats.DefaultAvgDegree, GraphStats.DefaultAvgDegree))
}

object GraphStats {
  /** catalog default when no stats collected — reference default avg
    * degree 5 (`GraphViewConnection.cs:344-346`)
    */
  val DefaultAvgDegree = 5.0

  /** Seeded random sample of ~`sampleRows` rows, collected driver-local:
    * the reference's `TABLESAMPLE (200 ROWS)` sampling tables
    * (`GraphViewConnection.cs:2964-2969`). A seeded `df.sample` (no
    * first-partition bias, deterministic run-to-run) capped at
    * `sampleRows`. Full-width rows — transient input for driver-side
    * endpoint extraction; the RETAINED probe sample is the slim
    * projection of [[slimSample]].
    */
  def sampledRowsOf(t: org.apache.spark.sql.DataFrame, totalRows: Long,
      sampleRows: Int = EdgeSampleRows): Array[org.apache.spark.sql.Row] = {
    val frac =
      if (totalRows <= sampleRows) 1.0
      // oversample 25% so the post-sample cap usually still sees
      // sampleRows rows despite Bernoulli variance
      else math.min(1.0, sampleRows.toDouble * 1.25 / totalRows)
    t.sample(withReplacement = false, frac, seed = 42L)
      .limit(sampleRows).collect()
  }

  /** [[sampledRowsOf]] re-materialized as a full-width LocalRelation —
    * the edge-sampling-table face (every adjacency of the sampled rows,
    * the reference's 200-rows-per-edge-column contract).
    */
  def sampleOf(t: org.apache.spark.sql.DataFrame, totalRows: Long,
      sampleRows: Int = EdgeSampleRows): org.apache.spark.sql.DataFrame =
    t.sparkSession.createDataFrame(
      java.util.Arrays.asList(sampledRowsOf(t, totalRows, sampleRows): _*),
      t.schema)

  /** The RETAINED per-table probe sample: the sampled rows with the
    * edge-machinery ARRAY columns (adjacency + tombstones, both
    * directions) dropped. Plan-time predicate probes only ever evaluate
    * node-property conjuncts and read GlobalNodeId, while the adjacency
    * arrays grow LINEARLY with scale factor (a supplier at sf1 carries
    * ~6000 adjacency entries) — keeping them would make each probe's
    * LocalRelation megabytes of driver memory AND ship those bytes as
    * task partition data whenever a probe plan doesn't constant-fold
    * (the once-per-cold-bench "task of very large size" WARN the r12/r13
    * stage maps pinned to the first stats-collecting query). Slim rows
    * are bounded by ~200 × scalar width at EVERY scale factor.
    */
  def slimSample(spark: org.apache.spark.sql.SparkSession,
      schema: org.apache.spark.sql.types.StructType,
      rows: Array[org.apache.spark.sql.Row],
      heavyCols: Set[String]): org.apache.spark.sql.DataFrame = {
    val keep = schema.fields.zipWithIndex.filterNot {
      case (f, _) => heavyCols(f.name)
    }
    val slim = rows.map(r => org.apache.spark.sql.Row.fromSeq(
      keep.map { case (_, i) => r.get(i) }.toSeq))
    spark.createDataFrame(
      java.util.Arrays.asList(slim: _*),
      org.apache.spark.sql.types.StructType(keep.map(_._1)))
  }

  /** the ArrayType edge-machinery columns of `table` (outgoing adjacency
    * + tombstones, incoming reversed mirrors + tombstones) — what
    * [[slimSample]] drops; scalar degree columns stay
    */
  def edgeArrayCols(g: GraphProvider, table: String): Set[String] = {
    val td = g.schema.table(table)
    (td.edges.flatMap(e => Seq(e.columnName, e.delColumnName)) ++
      g.schema.incomingEdges(table).flatMap(e =>
        Seq(e.reversedColumnName, e.reversedDelColumnName))).toSet
  }

  def collect(g: GraphProvider): GraphStats = {
    val rows = Map.newBuilder[String, Long]
    val degs = Map.newBuilder[(String, String), (Long, Double)]
    val samples = Map.newBuilder[String, org.apache.spark.sql.DataFrame]
    g.schema.tables.foreach { td =>
      val t = g.nodeTable(td.name)
      def slimOf(n: Long): org.apache.spark.sql.DataFrame =
        slimSample(t.sparkSession, t.schema,
          sampledRowsOf(t, n), edgeArrayCols(g, td.name))
      if (td.edges.isEmpty) {
        val n = t.count()
        rows += td.name -> n
        samples += td.name -> slimOf(n)
      } else {
        // live degree = adjacency size minus tombstones: after DELETE
        // EDGE (pre-compaction) the planner would otherwise cost
        // traversals with inflated degrees even though traversal
        // filters tombstones
        val aggs = count(lit(1)).as("__n") +:
          td.edges.map(e =>
            sum(size(col(e.columnName)) -
              coalesce(size(col(e.delColumnName)), lit(0))).as(s"__c_${e.name}"))
        val row = t.agg(aggs.head, aggs.tail: _*).head()
        val n = row.getAs[Long]("__n")
        rows += td.name -> n
        samples += td.name -> slimOf(n)
        td.edges.foreach { e =>
          val c = Option(row.getAs[Long](s"__c_${e.name}")).getOrElse(0L)
          degs += (td.name, e.name) -> ((c, if (n == 0) 0.0 else c.toDouble / n))
        }
      }
    }
    val rowMap = rows.result()
    val edgeMap = degs.result().map { case ((t, e), (c, d)) =>
      val sinkTable = // reversed degree needs the sink's row count
        rowMap.keys.find(_ == findSink(g, t, e)).map(rowMap).getOrElse(1L)
      (t, e) -> EdgeStat(c, d, if (sinkTable == 0) 0.0 else c.toDouble / sinkTable)
    }
    GraphStats(rowMap, edgeMap, samples = samples.result())
  }

  private def findSink(g: GraphProvider, table: String, edge: String): String =
    g.schema.table(table).edge(edge).sinkTable

  /** reference sampling size: 200 rows per edge column
    * (`GraphDbEdgeColumnSamplingRate`, `GraphViewConnection.cs:220-221`)
    */
  val EdgeSampleRows = 200

  /** The 100 TB mode: estimate degrees from a bounded per-table sample
    * (the reference's `_Sampling` tables) instead of full aggregation —
    * row counts still come from cheap `count()` (metadata-served for
    * parquet), degrees from `EdgeSampleRows` sampled rows, and per-edge
    * sink histograms from the same sample for join-selectivity
    * refinement.
    */
  def collectSampled(g: GraphProvider,
      sampleRows: Int = EdgeSampleRows): GraphStats = {
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    implicit val ec: ExecutionContext = ExecutionContext.global
    // per-table stats are independent — collect them concurrently so the
    // ~3 small jobs per table overlap instead of serializing (the driver
    // round-trips, not the data, dominate this phase); results are
    // combined deterministically below (seeded sampling, pure builds)
    final case class TableStat(name: String, n: Long,
        sample: org.apache.spark.sql.DataFrame, idHist: Histogram,
        edges: Seq[(String, (Long, Double), Histogram, Histogram)])
    val perTable = Await.result(
      Future.traverse(g.schema.tables) { td => Future {
        val t = g.nodeTable(td.name)
        val n = t.count()
        // one seeded random sample per table (not limit(n): first-partition
        // bias — the reference draws TABLESAMPLE, GraphViewConnection.cs:2964).
        // The full-width rows are TRANSIENT: endpoint/degree extraction
        // walks them right here on the driver (they were just collected —
        // a Spark job over their LocalRelation would only ship the same
        // bytes back out as task partition data), then only the slim
        // scalar projection is retained for plan-time probes.
        val rows = sampledRowsOf(t, n, sampleRows)
        val sampled = rows.length
        val schema = t.schema
        val gidIdx = schema.fieldIndex("GlobalNodeId")
        val idHist = Histogram.build(rows.map(_.getLong(gidIdx)).toSeq)
        val edgeStats = td.edges.map { e =>
          val adjIdx = schema.fieldIndex(e.columnName)
          val delIdx = schema.fieldIndex(e.delColumnName)
          val endpoints = rows.iterator.flatMap { r =>
            val src = r.getLong(gidIdx)
            val adj =
              if (r.isNullAt(adjIdx)) Seq.empty[org.apache.spark.sql.Row]
              else r.getSeq[org.apache.spark.sql.Row](adjIdx)
            val del: Set[Int] =
              if (r.isNullAt(delIdx)) Set.empty
              else r.getSeq[Int](delIdx).toSet
            adj.iterator
              .filter(er => !del.contains(er.getAs[Int]("edgeId")))
              .map(er => (src, er.getAs[Long]("sink")))
          }.toArray
          val sinks = endpoints.map(_._2).toSeq
          val avgDeg = if (sampled == 0) 0.0 else sinks.size.toDouble / sampled
          (e.name, (math.round(avgDeg * n), avgDeg),
            Histogram.build(sinks),
            Histogram.build(endpoints.map(_._1).toSeq))
        }
        val sample = slimSample(t.sparkSession, schema, rows,
          edgeArrayCols(g, td.name))
        TableStat(td.name, n, sample, idHist, edgeStats)
      }}, Duration.Inf)
    val rowMap = perTable.map(s => s.name -> s.n).toMap
    val edgeMap = perTable.flatMap(s => s.edges.map { case (e, (c, d), _, _) =>
      val sinkRows = rowMap.getOrElse(findSink(g, s.name, e), 1L)
      (s.name, e) -> EdgeStat(c, d, if (sinkRows == 0) 0.0 else c.toDouble / sinkRows)
    }).toMap
    GraphStats(rowMap, edgeMap,
      perTable.flatMap(s => s.edges.map { case (e, _, sk, _) => (s.name, e) -> sk }).toMap,
      perTable.flatMap(s => s.edges.map { case (e, _, _, sr) => (s.name, e) -> sr }).toMap,
      perTable.map(s => s.name -> s.idHist).toMap,
      perTable.map(s => s.name -> s.sample).toMap)
  }
}
