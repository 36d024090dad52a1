package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Stage.StageOps

/** Personalized PageRank in EXACT integer fixed-point — graph-based
  * relevance for curation ("rank everything by random-walk proximity
  * to this seed") with a bit-for-bit external oracle (beyond-reference
  * extension; the reference's graph surface stops at traversal).
  *
  * Floating-point PageRank cannot be oracle-checked across engines:
  * distributed double summation is order-dependent, and per-round
  * drift compounds. Here every quantity is a LONG at a fixed scale:
  *
  *   r₀(v)    = S·[v = source]
  *   r₊(v)   = (100-α)·(Σ_{u→v} r(u) div deg(u)) div 100
  *              + α·S div 100 · [v = source]
  *
  * with `div` integral division — both engines truncate identically,
  * integer sums are order-free, so `rounds` rounds produce IDENTICAL
  * longs everywhere (DuckDB replays the recurrence with `//`).
  * Truncation loses ≤ deg(u) parts per division — at S = 10¹² that is
  * a ~10⁻⁹ relative understatement per hop, far below any ranking
  * tie of interest; dangling-node mass exits the walk (the standard
  * sink-loss variant, same on both engines).
  *
  * Scale shape: the edge list (with out-degrees) is computed once and
  * staged; each round is one rank⋈edges join — the rank side is
  * bounded by |touched nodes| and broadcasts while small (AQE decides
  * when it stops being small) — plus one map-combined integer sum on
  * dst. The union with the restart row keeps the source alive even
  * when nothing flows back. Lineage is cut with a stage boundary each
  * round, so `rounds` is a latency knob, not a stack-depth hazard.
  */
object Ppr {

  def personalized(edges: DataFrame, srcCol: String, dstCol: String,
      source: Long, rounds: Int, alphaPct: Int = 15,
      scale: Long = 1000000000000L, boundaryEvery: Int = 2,
      localEdgeLimit: Int = LocalGraph.LocalEdgeLimit): DataFrame = {
    require(rounds >= 1, "rounds must be >= 1")
    require(alphaPct >= 1 && alphaPct <= 99, "alphaPct in [1,99]")
    require(boundaryEvery >= 1, "boundaryEvery must be >= 1")
    val spark = edges.sparkSession
    import spark.implicits._
    val e = edges.select(col(srcCol).cast(LongType).as("src"),
      col(dstCol).cast(LongType).as("dst")).distinct().stageBoundary
    // bounded driver-local finish (the Cc r14 pattern): the integral
    // recurrence is already exact and order-free, so replaying it on
    // the collected edge list yields the IDENTICAL longs without the
    // per-round join/aggregate scheduler latency. Spec-pinned equal
    // to the forced-distributed path; above the bound nothing changes.
    LocalGraph.probeLocal(e, localEdgeLimit) match {
      case Some(es) =>
        return localPersonalized(spark, es, source, rounds, alphaPct, scale)
      case None =>
    }
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    val ewd = e.join(deg, "src").stageBoundary
    val restart = alphaPct * scale / 100
    val keep = 100L - alphaPct
    var r = Seq((source, scale)).toDF("node", "rank")
    for (t <- 1 to rounds) {
      val inflow = ewd.join(r, ewd("src") === r("node"))
        .select(col("dst").as("node"),
          expr("rank div deg").as("contrib"))
        .groupBy("node").agg(sum("contrib").as("inflow"))
        // `div`, not `/`: Spark's `/` on longs is DOUBLE division —
        // the whole point here is integral truncation on both engines
        .select(col("node"), expr(s"($keep * inflow) div 100").as("part"))
      r = inflow
        .union(Seq((source, restart)).toDF("node", "part"))
        .groupBy("node").agg(sum("part").as("rank"))
      // lineage cut every few rounds, not every round: one action runs
      // the whole chain, so per-round eager materialization only buys
      // bounded plan depth — pay it at half the frequency
      if (t % boundaryEvery == 0 || t == rounds) r = r.stageBoundary
    }
    r
  }

  /** Driver-side replay of the integral recurrence — the same longs
    * in, the same longs out (integer division truncates identically;
    * integer sums are order-free): r₀ = {source → S}; each round
    * inflow(v) = Σ_{u→v, u∈r} r(u) div deg(u), then
    * rank(v) = (keep·inflow) div 100 (+ α·S div 100 at the source).
    * Nodes with rank 0 stay IN the map exactly like the distributed
    * union keeps their rows.
    */
  private def localPersonalized(spark: org.apache.spark.sql.SparkSession,
      es: Array[(Long, Long)], source: Long, rounds: Int,
      alphaPct: Int, scale: Long): DataFrame = {
    import spark.implicits._
    val (srcs, dsts, in) = LocalGraph.internEdges(es)
    val n = in.size
    val m = srcs.length
    val outDeg = new Array[Long](n)
    srcs.foreach(outDeg(_) += 1L)
    val restart = alphaPct * scale / 100
    val keep = 100L - alphaPct
    // a source absent from the edge list still ranks (restart mass
    // only) — intern it after the degree array is sized; no edge can
    // index the extra slot
    val srcIdx = in.intern(source)
    var rank = new java.util.HashMap[Integer, java.lang.Long]()
    rank.put(srcIdx, java.lang.Long.valueOf(scale))
    for (_ <- 1 to rounds) {
      val inflow = new java.util.HashMap[Integer, java.lang.Long]()
      var i = 0
      while (i < m) {
        val r = rank.get(srcs(i))
        if (r != null) {
          val contrib = r.longValue / outDeg(srcs(i))
          val prev = inflow.get(dsts(i))
          inflow.put(dsts(i),
            java.lang.Long.valueOf(
              (if (prev == null) 0L else prev.longValue) + contrib))
        }
        i += 1
      }
      val next = new java.util.HashMap[Integer, java.lang.Long]()
      val it = inflow.entrySet().iterator()
      while (it.hasNext) {
        val kv = it.next()
        next.put(kv.getKey,
          java.lang.Long.valueOf(keep * kv.getValue.longValue / 100))
      }
      val sPrev = next.get(srcIdx)
      next.put(srcIdx, java.lang.Long.valueOf(
        (if (sPrev == null) 0L else sPrev.longValue) + restart))
      rank = next
    }
    val out = new scala.collection.mutable.ArrayBuffer[(Long, Long)](
      rank.size)
    val it = rank.entrySet().iterator()
    while (it.hasNext) {
      val kv = it.next()
      out += ((in.name(kv.getKey.intValue), kv.getValue.longValue))
    }
    out.toSeq.toDF("node", "rank")
  }

  /** the DuckDB replay of [[personalized]] as a chained-CTE SQL text:
    * `edgeCte` must define a relation `e(src, dst)` (already distinct,
    * both directions if undirected); kept beside the implementation so
    * the two recurrences cannot drift apart. The final SELECT exposes
    * (node, rank).
    */
  def oracleSqlFor(edgeCte: String, source: Long, rounds: Int,
      alphaPct: Int = 15, scale: Long = 1000000000000L): String = {
    val restart = alphaPct * scale / 100
    val keep = 100L - alphaPct
    val roundCtes = (1 to rounds).map { t =>
      s"""f$t AS (SELECT e.dst AS node, SUM(p.rank // d.deg) AS inflow
         |  FROM r${t - 1} p JOIN e ON e.src = p.node
         |  JOIN deg d ON d.src = p.node GROUP BY e.dst),
         |r$t AS (SELECT node, CAST(SUM(part) AS BIGINT) AS rank FROM (
         |    SELECT node, ($keep * inflow) // 100 AS part FROM f$t
         |    UNION ALL SELECT CAST($source AS BIGINT), $restart)
         |  GROUP BY node)""".stripMargin
    }.mkString(",\n")
    s"""WITH $edgeCte,
       |deg AS (SELECT src, COUNT(*) AS deg FROM e GROUP BY src),
       |r0 AS (SELECT CAST($source AS BIGINT) AS node,
       |              CAST($scale AS BIGINT) AS rank),
       |$roundCtes
       |SELECT node, rank FROM r$rounds""".stripMargin
  }
}
