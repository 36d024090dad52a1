package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Stage.StageOps

/** k-core peeling (dense-subgraph extraction) — the degree-based
  * community filter between [[Cc]] (pure connectivity) and
  * [[Lpa]] (label refinement): iteratively remove nodes of degree < k
  * until the remainder is the k-core, the standard spam/outlier prune
  * before expensive per-community work (beyond-reference extension).
  *
  * Contract mirrors [[Lpa]]: the graph arrives as BOTH-DIRECTION edge
  * rows (the q_ppr/q_lpa undirected convention, degree = out-degree of
  * the doubled list), and [[peel]] runs a FIXED number of synchronous
  * peel rounds — a pure function of the graph that an external engine
  * replays exactly, where a convergence test would make the round
  * count data-dependent. [[core]] is the run-to-fixpoint face (peeling
  * is monotone — the edge set only shrinks — so the fixpoint IS the
  * k-core; one bounded driver count per round decides termination).
  *
  * Scale shape per round: one map-combined degree count + two
  * semi-joins of the edge list against the (≤ nodes) survivor set —
  * survivors broadcast while small, AQE otherwise; stage boundaries
  * cut lineage. No windows, no collects.
  */
object KCore {

  /** surviving (node, deg) after exactly `rounds` synchronous peels at
    * threshold `k` — deg is the node's degree in the round-`rounds`
    * subgraph (the NEXT round's filter input, so a non-converged call
    * may report nodes still below k; [[core]] never does)
    */
  def peel(edges: DataFrame, srcCol: String, dstCol: String,
      k: Int, rounds: Int,
      localEdgeLimit: Int = LocalGraph.LocalEdgeLimit): DataFrame = {
    require(k >= 1, "k must be >= 1")
    require(rounds >= 1, "rounds must be >= 1")
    var e = normalized(edges, srcCol, dstCol).stageBoundary
    // bounded driver-local finish (the Cc r14 pattern) — the same
    // synchronous peel recurrence on the collected edge list;
    // spec-pinned equal to the forced-distributed path
    LocalGraph.probeLocal(e, localEdgeLimit) match {
      case Some(es) =>
        return localPeel(edges.sparkSession, es, k, Some(rounds), rounds)
      case None =>
    }
    for (_ <- 1 to rounds) e = peelOnce(e, k)
    degrees(e)
  }

  /** the k-core itself: peel to fixpoint (edge set monotone ⇒ the
    * first round that removes nothing is the fixpoint). One driver
    * count per round — bounded by `maxRounds`, failing loudly rather
    * than silently returning a non-core.
    */
  def core(edges: DataFrame, srcCol: String, dstCol: String,
      k: Int, maxRounds: Int = 100,
      localEdgeLimit: Int = LocalGraph.LocalEdgeLimit): DataFrame = {
    require(k >= 1, "k must be >= 1")
    var e = normalized(edges, srcCol, dstCol).stageBoundary
    LocalGraph.probeLocal(e, localEdgeLimit) match {
      case Some(es) =>
        return localPeel(edges.sparkSession, es, k, None, maxRounds)
      case None =>
    }
    var prev = e.count()
    var rounds = 0
    while (rounds < maxRounds) {
      e = peelOnce(e, k)
      val n = e.count()
      if (n == prev) return degrees(e)
      prev = n
      rounds += 1
    }
    throw new IllegalStateException(
      s"kCore: no fixpoint after $maxRounds rounds — raise maxRounds")
  }

  private def normalized(edges: DataFrame, srcCol: String,
      dstCol: String): DataFrame =
    edges.select(col(srcCol).cast(LongType).as("src"),
      col(dstCol).cast(LongType).as("dst")).distinct()

  private def peelOnce(e: DataFrame, k: Int): DataFrame = {
    val keep = degrees(e).filter(col("deg") >= k).select("node")
    e.join(keep.withColumnRenamed("node", "__ka"),
        col("src") === col("__ka"), "left_semi")
      .join(keep.withColumnRenamed("node", "__kb"),
        col("dst") === col("__kb"), "left_semi")
      .stageBoundary
  }

  private def degrees(e: DataFrame): DataFrame =
    e.groupBy(col("src").as("node")).agg(count(lit(1)).as("deg"))

  /** Driver-side replay of the peel recurrence: per round, keep =
    * nodes whose OUT-degree over the live edge set is ≥ k (the
    * doubled-list degree convention), live edges = both endpoints
    * kept; fixed mode runs exactly `rounds` peels, fixpoint mode
    * stops at the first peel that removes nothing (edge-count
    * comparison, like the distributed face) and throws past
    * `maxRounds`. Output = out-degrees of the final edge set.
    */
  private def localPeel(spark: org.apache.spark.sql.SparkSession,
      es: Array[(Long, Long)], k: Int, fixedRounds: Option[Int],
      maxRounds: Int): DataFrame = {
    import spark.implicits._
    val (srcs, dsts, in) = LocalGraph.internEdges(es)
    val n = in.size
    val m = srcs.length
    val live = Array.fill(m)(true)
    var liveCount = m.toLong
    def peelLocalOnce(): Unit = {
      val outDeg = new Array[Int](n)
      var i = 0
      while (i < m) { if (live(i)) outDeg(srcs(i)) += 1; i += 1 }
      i = 0
      while (i < m) {
        if (live(i) &&
            (outDeg(srcs(i)) < k || outDeg(dsts(i)) < k)) {
          live(i) = false; liveCount -= 1
        }
        i += 1
      }
    }
    fixedRounds match {
      case Some(r) => for (_ <- 1 to r) peelLocalOnce()
      case None =>
        var prev = liveCount
        var rounds = 0
        var fixed = false
        while (!fixed && rounds < maxRounds) {
          peelLocalOnce()
          if (liveCount == prev) fixed = true
          else { prev = liveCount; rounds += 1 }
        }
        if (!fixed) throw new IllegalStateException(
          s"kCore: no fixpoint after $maxRounds rounds — raise maxRounds")
    }
    val deg = new Array[Long](n)
    var i = 0
    while (i < m) { if (live(i)) deg(srcs(i)) += 1L; i += 1 }
    (0 until n).filter(deg(_) > 0L).map(v => (in.name(v), deg(v)))
      .toDF("node", "deg")
  }

  /** the DuckDB replay of [[peel]] as chained CTEs: `edgeCte` must
    * define `e(src, dst)` (already distinct, both directions); exposes
    * (node, deg) after `rounds` peels at threshold `k`. Kept beside
    * the implementation so the recurrences cannot drift (the
    * [[Ppr]]/[[Lpa]] oracle-generation pattern).
    */
  def oracleSqlFor(edgeCte: String, k: Int, rounds: Int): String = {
    val roundCtes = (1 to rounds).map { t =>
      s"""d$t AS (SELECT src AS node, COUNT(*) AS deg
         |  FROM r${t - 1} GROUP BY src),
         |k$t AS (SELECT node FROM d$t WHERE deg >= $k),
         |r$t AS (SELECT r.src, r.dst FROM r${t - 1} r
         |  JOIN k$t a ON r.src = a.node
         |  JOIN k$t b ON r.dst = b.node)""".stripMargin
    }.mkString(",\n")
    s"""WITH $edgeCte,
       |r0 AS (SELECT src, dst FROM e),
       |$roundCtes
       |SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS deg
       |FROM r$rounds GROUP BY src""".stripMargin
  }
}
