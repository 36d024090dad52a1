package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Stage.StageOps

/** Topological layering + cycle detection over a DIRECTED edge list
  * (Kahn's algorithm as synchronous rounds): round t removes every
  * node whose remaining in-degree is zero and stamps it `layer = t`;
  * nodes still present when the peeling stops are ON or DOWNSTREAM OF
  * a cycle and report `layer = -1`. The lineage/dependency primitive
  * (dataset provenance DAGs, curation-stage ordering, FK hierarchies)
  * beside [[KCore]]'s density peel — same determinism contract: a
  * FIXED `rounds` count is a pure function of the graph an external
  * engine replays exactly; [[sort]] is the run-to-fixpoint face
  * (node removal is monotone, so the first round that removes nothing
  * is the fixpoint — from there no in-degree ever drops again).
  *
  * Scale shape per round: one map-combined distinct-dst set + one
  * anti-join (the zero-in-degree frontier) + two semi-joins
  * restricting nodes/edges — frontier and node sets broadcast while
  * small; stage boundaries cut lineage. No windows, no collects.
  */
object Topo {

  /** (node, layer) after exactly `rounds` Kahn rounds — layer ∈
    * [0, rounds) for removed nodes, -1 for nodes still present (which
    * after convergence means cycle-involved; before convergence it
    * just means "not yet removable")
    */
  def layers(edges: DataFrame, srcCol: String, dstCol: String,
      rounds: Int,
      localEdgeLimit: Int = LocalGraph.LocalEdgeLimit): DataFrame = {
    require(rounds >= 1, "rounds must be >= 1")
    run(edges, srcCol, dstCol, Some(rounds), rounds, localEdgeLimit)
  }

  /** layers at the fixpoint: every `layer = -1` node is on or
    * downstream of a cycle; an acyclic graph gets a complete
    * topological layering. Bounded by `maxRounds` (longest path in a
    * DAG), failing loudly rather than mislabeling.
    */
  def sort(edges: DataFrame, srcCol: String, dstCol: String,
      maxRounds: Int = 1000,
      localEdgeLimit: Int = LocalGraph.LocalEdgeLimit): DataFrame =
    run(edges, srcCol, dstCol, None, maxRounds, localEdgeLimit)

  private def run(edges: DataFrame, srcCol: String, dstCol: String,
      fixedRounds: Option[Int], maxRounds: Int,
      localEdgeLimit: Int): DataFrame = {
    var e = edges.select(col(srcCol).cast(LongType).as("src"),
      col(dstCol).cast(LongType).as("dst")).distinct().stageBoundary
    // bounded driver-local finish (the Cc r14 pattern): each Kahn
    // round is 4+ jobs (frontier anti-join + two semi-joins + count);
    // below the edge bound the same peel recurrence runs on the
    // collected edge list with in-degree decrements. Deterministic by
    // construction (layer stamps are a pure function of the graph);
    // spec-pinned equal to the forced-distributed path.
    LocalGraph.probeLocal(e, localEdgeLimit) match {
      case Some(es) =>
        return localRun(edges.sparkSession, es, fixedRounds, maxRounds)
      case None =>
    }
    var nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().stageBoundary
    val spark = edges.sparkSession
    import spark.implicits._
    var out = Seq.empty[(Long, Long)].toDF("node", "layer")
    var t = 0
    var done = false
    while (!done && t < maxRounds) {
      val zero = nodes.join(e.select(col("dst").as("node")).distinct(),
        Seq("node"), "left_anti").stageBoundary
      val removedAny = fixedRounds.isDefined || zero.limit(1).count() > 0
      if (!removedAny) done = true
      else {
        out = out.unionByName(
          zero.select(col("node"), lit(t.toLong).as("layer")))
        nodes = nodes.join(zero, Seq("node"), "left_anti").stageBoundary
        e = e.join(zero.withColumnRenamed("node", "__z"),
          col("src") === col("__z"), "left_anti").stageBoundary
        t += 1
        if (fixedRounds.contains(t)) done = true
      }
    }
    if (fixedRounds.isEmpty && t >= maxRounds)
      throw new IllegalStateException(
        s"topo sort: no fixpoint after $maxRounds rounds — raise " +
          "maxRounds (longest DAG path exceeds it)")
    out.unionByName(nodes.select(col("node"), lit(-1L).as("layer")))
  }

  /** Driver-side replay of the Kahn recurrence: round t removes every
    * live node with no remaining in-edge and stamps it `layer = t`
    * (in-degrees drop only when a REMOVED node's out-edges leave);
    * fixed-round mode runs exactly `rounds` rounds (empty frontiers
    * included), fixpoint mode stops at the first empty frontier;
    * survivors report -1. Identical to the distributed rounds.
    */
  private def localRun(spark: org.apache.spark.sql.SparkSession,
      es: Array[(Long, Long)], fixedRounds: Option[Int],
      maxRounds: Int): DataFrame = {
    import spark.implicits._
    val (srcs, dsts, in) = LocalGraph.internEdges(es)
    val n = in.size
    val (start, outAdj) = LocalGraph.csr(n, srcs, dsts)
    val inDeg = new Array[Int](n)
    dsts.foreach(inDeg(_) += 1)
    val layer = Array.fill(n)(-1L)
    var frontier = (0 until n).filter(inDeg(_) == 0).toArray
    var t = 0
    var done = false
    while (!done && t < maxRounds) {
      if (fixedRounds.isEmpty && frontier.isEmpty) done = true
      else {
        val next = new scala.collection.mutable.ArrayBuffer[Int]()
        frontier.foreach { u =>
          layer(u) = t.toLong
          var j = start(u)
          while (j < start(u + 1)) {
            val w = outAdj(j)
            inDeg(w) -= 1
            if (inDeg(w) == 0 && layer(w) == -1L) next += w
            j += 1
          }
        }
        frontier = next.toArray
        t += 1
        if (fixedRounds.contains(t)) done = true
      }
    }
    if (fixedRounds.isEmpty && !done)
      throw new IllegalStateException(
        s"topo sort: no fixpoint after $maxRounds rounds — raise " +
          "maxRounds (longest DAG path exceeds it)")
    Array.tabulate(n)(i => (in.name(i), layer(i))).toSeq
      .toDF("node", "layer")
  }

  /** the FIXPOINT oracle ([[sort]]'s contract) as ONE bounded
    * recursive walk CTE — equivalent to, but far cheaper than, chaining
    * [[oracleSqlFor]] round CTEs to an overshoot count (each chained
    * round references its predecessors 2-3×, and engines that inline
    * CTEs pay 2^rounds re-evaluations; the walk CTE is linear in the
    * number of bounded walks).
    *
    * Equivalence (for `cap` > the graph's longest acyclic-ancestry
    * path): Kahn removes node v at round t where t is the longest
    * directed path ending at v whose every ancestor is cycle-free — for
    * a node with NO cycle among its ancestors that is exactly the
    * longest incoming walk, so `layer(v) = MAX(walk length)`. A node
    * with a cycle among its ancestors has incoming walks of EVERY
    * length (pump the cycle), so it — and only it — reaches `cap`,
    * which maps to the survivor layer -1. An undershot `cap` on a
    * deeper future fixture misclassifies deep DAG nodes as survivors
    * and fails visibly as a hash mismatch, same failure mode as an
    * undershot chained-round oracle.
    */
  def fixpointOracleSql(edgeCte: String, cap: Int): String = {
    require(cap >= 1, "cap must be >= 1")
    s"""WITH RECURSIVE $edgeCte,
       |n0 AS (SELECT DISTINCT node FROM
       |  (SELECT src AS node FROM e UNION ALL SELECT dst FROM e)),
       |w(node, len) AS (
       |  SELECT node, 0 FROM n0
       |  UNION ALL
       |  SELECT e.dst, w.len + 1 FROM w JOIN e ON e.src = w.node
       |  WHERE w.len < $cap),
       |m AS (SELECT node, MAX(len) AS ml FROM w GROUP BY node)
       |SELECT node,
       |  CAST(CASE WHEN ml >= $cap THEN -1 ELSE ml END AS BIGINT) AS layer
       |FROM m""".stripMargin
  }

  /** the DuckDB replay of [[layers]] as chained CTEs: `edgeCte` must
    * define `e(src, dst)` (directed, already distinct); exposes
    * (node, layer) after `rounds` rounds, -1 for survivors. Generated
    * from the same recurrence the Spark rounds run (the
    * [[Ppr]]/[[Lpa]]/[[KCore]] pattern).
    */
  def oracleSqlFor(edgeCte: String, rounds: Int): String = {
    val roundCtes = (0 until rounds).map { t =>
      s"""z$t AS (SELECT node FROM n$t WHERE node NOT IN
         |  (SELECT dst FROM e$t)),
         |n${t + 1} AS (SELECT node FROM n$t WHERE node NOT IN
         |  (SELECT node FROM z$t)),
         |e${t + 1} AS (SELECT src, dst FROM e$t WHERE src IN
         |  (SELECT node FROM n${t + 1}))""".stripMargin
    }.mkString(",\n")
    val layerRows = (0 until rounds)
      .map(t => s"SELECT node, CAST($t AS BIGINT) AS layer FROM z$t")
      .mkString("\nUNION ALL\n")
    s"""WITH $edgeCte,
       |e0 AS (SELECT src, dst FROM e),
       |n0 AS (SELECT DISTINCT node FROM
       |  (SELECT src AS node FROM e0 UNION ALL SELECT dst FROM e0)),
       |$roundCtes
       |$layerRows
       |UNION ALL
       |SELECT node, CAST(-1 AS BIGINT) AS layer FROM n$rounds""".stripMargin
  }
}
