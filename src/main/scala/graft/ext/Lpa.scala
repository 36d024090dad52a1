package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Stage.StageOps

/** Synchronous label propagation (community detection) with fully
  * deterministic tie-breaks — the cluster-refinement step between
  * [[Cc]] (pure connectivity: one bridge edge glues two communities)
  * and anything model-based: dense neighborhoods keep their own label,
  * weak bridges don't propagate (beyond-reference extension).
  *
  * Semantics, chosen so an external engine replays them EXACTLY:
  * labels start as the node id; each synchronous round every node
  * adopts the most frequent label among its in-neighbors, ties broken
  * by SMALLEST label; nodes with no in-edges keep their label. A
  * fixed `rounds` count (not a convergence test) makes the output a
  * pure function of the graph — LPA on bipartite-ish structures can
  * oscillate, and "run k rounds" is the deterministic contract both
  * engines can share. All counts are integers; no randomness anywhere
  * (the classic formulation breaks ties randomly — that can never be
  * oracle-checked).
  *
  * Scale shape per round: one labels⋈edges join (labels side is
  * |nodes| rows and broadcasts while small), one map-combined
  * (node, label) count, then the deterministic argmax as max-count +
  * min-label aggregations — no windows; stage boundaries cut lineage.
  */
object Lpa {

  def propagate(edges: DataFrame, srcCol: String, dstCol: String,
      rounds: Int,
      localEdgeLimit: Int = LocalGraph.LocalEdgeLimit): DataFrame = {
    require(rounds >= 1, "rounds must be >= 1")
    val e = edges.select(col(srcCol).cast(LongType).as("src"),
      col(dstCol).cast(LongType).as("dst")).distinct().stageBoundary
    // bounded driver-local finish (the Cc r14 pattern): each
    // distributed round is 4 jobs of joins/aggregations; below the
    // edge bound the same synchronous recurrence (most-frequent
    // in-neighbor label, ties to SMALLEST — fully deterministic, no
    // randomness to diverge on) runs on the collected edge list.
    // Spec-pinned equal to the forced-distributed path.
    LocalGraph.probeLocal(e, localEdgeLimit) match {
      case Some(es) =>
        return localPropagate(edges.sparkSession, es, rounds)
      case None =>
    }
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    var labels = nodes.select(col("node"), col("node").as("label"))
      .stageBoundary
    for (_ <- 1 to rounds) {
      val counts = e.join(labels, e("src") === labels("node"))
        .groupBy(col("dst"), col("label"))
        .agg(count(lit(1)).as("cnt"))
      val best = counts.groupBy(col("dst")).agg(max(col("cnt")).as("mc"))
      val won = counts.as("c")
        .join(best.as("b"),
          col("c.dst") === col("b.dst") && col("c.cnt") === col("b.mc"))
        .groupBy(col("c.dst").as("__n"))
        .agg(min(col("c.label")).as("__l"))
      labels = labels.as("l")
        .join(won, col("l.node") === col("__n"), "left")
        .select(col("l.node").as("node"),
          coalesce(col("__l"), col("l.label")).as("label"))
        .stageBoundary
    }
    labels
  }

  /** Driver-side replay of the synchronous recurrence: labels start
    * as the node id; each round every node with in-edges adopts the
    * most frequent label among its in-neighbors' PREVIOUS-round
    * labels, ties to the smallest label. Bit-identical to the
    * distributed rounds (integer counts, total-order tie-break).
    */
  private def localPropagate(spark: org.apache.spark.sql.SparkSession,
      es: Array[(Long, Long)], rounds: Int): DataFrame = {
    import spark.implicits._
    val (srcs, dsts, in) = LocalGraph.internEdges(es)
    val n = in.size
    // in-adjacency: for each node, the list of its in-neighbors
    val (start, inAdj) = LocalGraph.csr(n, dsts, srcs)
    var labels = Array.tabulate(n)(i => in.name(i))
    val counts = new java.util.HashMap[Long, Integer]()
    for (_ <- 1 to rounds) {
      val next = new Array[Long](n)
      var v = 0
      while (v < n) {
        if (start(v) == start(v + 1)) next(v) = labels(v)
        else {
          counts.clear()
          var j = start(v)
          while (j < start(v + 1)) {
            val l = labels(inAdj(j))
            val c = counts.get(l)
            counts.put(l, if (c == null) 1 else c.intValue + 1)
            j += 1
          }
          var bestLabel = Long.MaxValue
          var bestCnt = 0
          val it = counts.entrySet().iterator()
          while (it.hasNext) {
            val kv = it.next()
            val c = kv.getValue.intValue
            if (c > bestCnt ||
                (c == bestCnt && kv.getKey < bestLabel)) {
              bestCnt = c; bestLabel = kv.getKey
            }
          }
          next(v) = bestLabel
        }
        v += 1
      }
      labels = next
    }
    Array.tabulate(n)(i => (in.name(i), labels(i))).toSeq
      .toDF("node", "label")
  }

  /** the DuckDB replay of [[propagate]] as chained CTEs: `edgeCte`
    * must define `e(src, dst)` (already distinct); exposes
    * (node, label) after `rounds` rounds. Kept beside the
    * implementation so the recurrences cannot drift.
    */
  def oracleSqlFor(edgeCte: String, rounds: Int): String = {
    val roundCtes = (1 to rounds).map { t =>
      s"""c$t AS (SELECT e.dst AS node, p.label, COUNT(*) AS cnt
         |  FROM l${t - 1} p JOIN e ON e.src = p.node
         |  GROUP BY e.dst, p.label),
         |m$t AS (SELECT node, MAX(cnt) AS mc FROM c$t GROUP BY node),
         |w$t AS (SELECT c.node, MIN(c.label) AS label
         |  FROM c$t c JOIN m$t m ON c.node = m.node AND c.cnt = m.mc
         |  GROUP BY c.node),
         |l$t AS (SELECT p.node, COALESCE(w.label, p.label) AS label
         |  FROM l${t - 1} p LEFT JOIN w$t w ON p.node = w.node)""".stripMargin
    }.mkString(",\n")
    s"""WITH $edgeCte,
       |n AS (SELECT DISTINCT node FROM
       |  (SELECT src AS node FROM e UNION ALL SELECT dst FROM e)),
       |l0 AS (SELECT node, node AS label FROM n),
       |$roundCtes
       |SELECT node, label FROM l$rounds""".stripMargin
  }
}
