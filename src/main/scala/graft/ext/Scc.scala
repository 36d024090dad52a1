package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Stage.StageOps

/** Strongly connected components (directed graphs) — the directed
  * member of the components family ([[Cc]] = undirected connectivity,
  * [[Lpa]] = communities): cycle detection in dependency/citation/link
  * graphs, the "mutual-reachability cluster" a directed near-dup or
  * plagiarism graph actually means (A copied B AND B copied A is a
  * very different relationship than one direction alone).
  *
  * Algorithm: bidirectional min-reach LABEL REFINEMENT (the FW-BW
  * idea of Fleischer et al. / Slota-Hong run with min-id labels for
  * every pivot at once, in DataFrame ops) —
  *
  *   1. `fwd(v)` = min id reaching v (ancestors-or-self), `bwd(v)` =
  *      min id v reaches (descendants-or-self), each a min fixpoint
  *      accelerated by POINTER JUMPING (`lab(v) ← min(lab(v),
  *      lab(lab(v)))` alongside the edge relax — label distance
  *      doubles per step, so a diameter-d path needs O(log d)
  *      iterations, not d);
  *   2. both labels are CONSTANT on an SCC (mutual reachability makes
  *      members' reach sets identical), and `fwd(v) = bwd(v) = w`
  *      certifies v ∈ SCC(w) (w reaches v and v reaches w), so all
  *      such nodes extract with final canonical label w = the SCC's
  *      min member — at minimum the globally-min node's SCC
  *      qualifies every round, guaranteeing progress;
  *   3. an edge whose endpoints carry different (fwd, bwd) pairs
  *      links different SCCs (contrapositive of constancy) and is
  *      DELETED; the remainder repeats on the pruned subgraph.
  *
  * Every extracted label is final and canonical (min member), so the
  * output is a pure function of the graph — an external engine
  * replays it from the transitive closure. Determinism needs no
  * tie-breaking at all: min-labels are aggregates.
  *
  * Scale shape: the r7 coloring peeled one "root layer" of SCCs per
  * outer round, so a DAG chain of n singleton SCCs needed n rounds
  * (and its forward fixpoint walked the chain one hop per step). The
  * cross-pair edge deletion fixes the outer loop — a pure DAG gives
  * every node a distinct (fwd, bwd) pair, so ALL its edges delete in
  * round 1 and every node extracts in round 2 — and pointer jumping
  * fixes the inner one (StressRank's 100k-singleton chain: 2 outer
  * rounds, ~log inner iterations). `maxRounds` stays as a guard for
  * adversarial onion topologies — whose measured law is LOGARITHMIC,
  * not depth-proportional: `tools/StressOnion` pins 10,000-layer
  * cycle-chains at 2 rounds (asc/desc ids), 13 rounds (recursive
  * middle-min layout, = log₂ L exactly) and 21 rounds (random
  * permutation, ≈1.6·log₂ L), each verified node-exact (PLANS.md r9).
  */
object Scc {

  /** min label reachable INTO each node over `edges` (src → dst
    * propagation); nodes: (node), edges: (src, dst). Relax + pointer
    * jump per iteration, to fixpoint.
    */
  private def minReach(nodes: DataFrame, edges: DataFrame): DataFrame = {
    var m = nodes.select(col("node"), col("node").as("lab")).stageBoundary
    var stable = false
    while (!stable) {
      val relaxed = edges.join(m, edges("src") === m("node"))
        .select(edges("dst").as("node"), col("lab"))
        .groupBy("node").agg(min("lab").as("__rl"))
      val jumped = m
        .join(m.select(col("node").as("__jn"), col("lab").as("__jl")),
          m("lab") === col("__jn"), "left")
        .select(m("node"), m("lab"), col("__jl"))
      val next = jumped.join(relaxed, Seq("node"), "left")
        .select(col("node"),
          least(col("lab"), coalesce(col("__jl"), col("lab")),
            coalesce(col("__rl"), col("lab"))).as("lab"))
        .stageBoundary
      stable = next.join(m.withColumnRenamed("lab", "__old"), Seq("node"))
        .filter(col("lab") =!= col("__old")).isEmpty
      m = next
    }
    m
  }

  /** (node, component) for every node appearing in `edges`;
    * `component` = the SCC's minimum member id. Self-loops are
    * irrelevant to SCC membership and dropped. */
  def strongComponents(edges: DataFrame, srcCol: String, dstCol: String,
      maxRounds: Int = 100,
      roundObserver: Int => Unit = _ => (),
      localEdgeLimit: Int = LocalGraph.LocalEdgeLimit): DataFrame = {
    val spark = edges.sparkSession
    val e0 = edges.select(col(srcCol).cast(LongType).as("src"),
      col(dstCol).cast(LongType).as("dst"))
      .filter(col("src") =!= col("dst")).distinct().stageBoundary
    // bounded driver-local finish (the Cc r14 pattern): the label
    // refinement pays ~10 jobs per outer round; below the edge bound
    // one Tarjan pass over the collected edge list produces the SAME
    // unique labeling (component = min member — order-independent, so
    // DFS order cannot leak into the answer). Spec-pinned equal to the
    // forced-distributed path; above the bound nothing changes.
    LocalGraph.probeLocal(e0, localEdgeLimit) match {
      case Some(es) => return localScc(spark, es)
      case None =>
    }
    val allNodes = e0.select(col("src").as("node"))
      .union(e0.select(col("dst").as("node"))).distinct().stageBoundary
    var remaining = allNodes
    var eRem = e0
    var result = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("node", LongType, nullable = false),
        StructField("component", LongType, nullable = false))))
    var rounds = 0
    while (!remaining.isEmpty) {
      rounds += 1
      roundObserver(rounds)
      require(rounds <= maxRounds,
        s"SCC refinement exceeded $maxRounds rounds — an adversarial " +
          "nesting of components; raise maxRounds or shard upstream")
      val fwd = minReach(remaining, eRem)
        .withColumnRenamed("lab", "fwd")
      val bwd = minReach(remaining,
        eRem.select(col("dst").as("src"), col("src").as("dst")))
        .withColumnRenamed("lab", "bwd")
      val lab = remaining.join(fwd, Seq("node")).join(bwd, Seq("node"))
        .stageBoundary
      val done = lab.filter(col("fwd") === col("bwd"))
        .select(col("node"), col("fwd").as("component"))
      result = result.union(done).stageBoundary
      remaining = remaining.join(done, Seq("node"), "left_anti")
        .stageBoundary
      // surviving edges: endpoints share the (fwd, bwd) pair (else
      // provably inter-SCC) and neither endpoint was extracted
      eRem = eRem
        .join(lab.select(col("node").as("src"), col("fwd").as("__fs"),
          col("bwd").as("__bs")), Seq("src"))
        .join(lab.select(col("node").as("dst"), col("fwd").as("__fd"),
          col("bwd").as("__bd")), Seq("dst"))
        .filter(col("__fs") === col("__fd") && col("__bs") === col("__bd") &&
          col("__fs") =!= col("__bs"))
        .select("src", "dst")
        .stageBoundary
    }
    result
  }

  /** Driver-side finish for an edge set under the local bound:
    * iterative Tarjan over a CSR adjacency, each SCC labeled by its
    * MINIMUM member — exactly the distributed refinement's unique
    * labeling (both are "component = min id of the mutual-reachability
    * class"; no tie-breaking exists to diverge on). Self-loops were
    * dropped and edges de-duplicated by the caller.
    */
  private def localScc(spark: org.apache.spark.sql.SparkSession,
      es: Array[(Long, Long)]): DataFrame = {
    import spark.implicits._
    val (srcs, dsts, in) = LocalGraph.internEdges(es)
    val n = in.size
    val (start, adj) = LocalGraph.csr(n, srcs, dsts)
    val index = Array.fill(n)(-1)
    val low = new Array[Int](n)
    val onStack = new Array[Boolean](n)
    val compOf = new Array[Int](n)
    val compMin = new scala.collection.mutable.ArrayBuffer[Long]()
    val sccStack = new java.util.ArrayDeque[Integer]()
    // explicit DFS stack (node + next-edge cursor): recursion depth is
    // O(n) on chains, far past the JVM stack at the 2M-edge bound
    val dfsNode = new Array[Int](n)
    val dfsEdge = new Array[Int](n)
    var counter = 0
    var v = 0
    while (v < n) {
      if (index(v) == -1) {
        var sp = 0
        dfsNode(0) = v; dfsEdge(0) = start(v)
        index(v) = counter; low(v) = counter; counter += 1
        sccStack.push(Integer.valueOf(v)); onStack(v) = true
        while (sp >= 0) {
          val u = dfsNode(sp)
          if (dfsEdge(sp) < start(u + 1)) {
            val w = adj(dfsEdge(sp)); dfsEdge(sp) += 1
            if (index(w) == -1) {
              index(w) = counter; low(w) = counter; counter += 1
              sccStack.push(Integer.valueOf(w)); onStack(w) = true
              sp += 1; dfsNode(sp) = w; dfsEdge(sp) = start(w)
            } else if (onStack(w) && index(w) < low(u)) low(u) = index(w)
          } else {
            if (low(u) == index(u)) {
              var mn = Long.MaxValue
              val members = new scala.collection.mutable.ArrayBuffer[Int]()
              var w = -1
              while (w != u) {
                w = sccStack.pop().intValue; onStack(w) = false
                members += w
                if (in.name(w) < mn) mn = in.name(w)
              }
              val cid = compMin.length
              members.foreach(compOf(_) = cid)
              compMin += mn
            }
            sp -= 1
            if (sp >= 0) {
              val p = dfsNode(sp)
              if (low(u) < low(p)) low(p) = low(u)
            }
          }
        }
      }
      v += 1
    }
    val out = new Array[(Long, Long)](n)
    var i = 0
    while (i < n) { out(i) = (in.name(i), compMin(compOf(i))); i += 1 }
    out.toSeq.toDF("node", "component")
  }

  /** DuckDB replay from the transitive closure: `edgeCte` must define
    * `e(src, dst)`; exposes (node, component) with component = min of
    * the mutual-reachability class. Exact for any graph the closure
    * fits — the ORACLE side may be quadratic, the engine side never
    * materializes reachability.
    */
  def oracleSqlFor(edgeCte: String): String =
    s"""WITH RECURSIVE $edgeCte,
       |ed AS (SELECT DISTINCT src, dst FROM e WHERE src <> dst),
       |n AS (SELECT DISTINCT node FROM
       |  (SELECT src AS node FROM ed UNION ALL SELECT dst FROM ed)),
       |reach(src, dst) AS (
       |  SELECT src, dst FROM ed
       |  UNION
       |  SELECT r.src, ed.dst FROM reach r JOIN ed ON ed.src = r.dst),
       |mutual AS (
       |  SELECT a.src AS u, a.dst AS v FROM reach a
       |  JOIN reach b ON a.src = b.dst AND a.dst = b.src)
       |SELECT n.node,
       |  LEAST(n.node, COALESCE(MIN(m.v), n.node)) AS component
       |FROM n LEFT JOIN mutual m ON m.u = n.node
       |GROUP BY n.node""".stripMargin
}
