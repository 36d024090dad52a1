package graft.ext

import graft.Stage.StageOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** DataFrame-native connected components by alternating
  * large-star / small-star rounds (Kiveris et al., "Connected
  * Components in MapReduce and Beyond", SoCC 2014) — the transitive
  * closure that turns near-dup PAIRS (MinHash/SimHash/jaccard/CDC
  * emit pairs) into canonical dup CLUSTERS.
  *
  * Why this exists next to [[graft.ext.Dedup.resolveClusters]]
  * (GraphX): the Pregel min-propagation there converges in O(cluster
  * diameter) supersteps — fine for shallow near-dup clusters, but a
  * crawl timeline of pairwise-similar snapshots is a CHAIN, and a
  * 10k-long chain is 10k supersteps of RDD shuffles. Star contraction
  * converges in O(log² n) rounds regardless of diameter, and staying
  * in DataFrames keeps every round in Tungsten with AQE handling the
  * hot-key skew that the component minimum inevitably becomes.
  *
  * Per round the work is: one symmetric projection of the edge set
  * (map), one map-combined `min` aggregation on the 8-byte node key,
  * one equi-join of neighbors against those minima on the same key
  * (co-hashed — AQE reuses the exchange), and a distinct. Nothing is
  * ever proportional to a neighborhood list held in memory: the
  * per-node minimum is an aggregate, NOT a `collect_list`, so a
  * 100M-degree hub costs its partial aggregates, not a 800MB array
  * row. Each round ends in an eager stage boundary to truncate
  * lineage (the PathExpand fixpoint move) — through `Stage.boundary`,
  * which also replaces the checkpoint's inherited join-estimate stats
  * with measured bytes (a raw localCheckpoint here made the runtime
  * filter rule treat the tiny per-round edge set as huge and pack
  * default-sized bloom filters into every task binary — the r9
  * 2-3 MiB task-binary WARNs in q_dedup_cc_incremental).
  *
  * Determinism: the final labeling (every node → the minimum id in
  * its component) is unique, so the merge/join order inside rounds
  * cannot leak into the answer — which is what lets a recursive-CTE
  * oracle replay it exactly.
  */
object Cc {

  /** Connected components over an undirected pair list. Returns one
    * row per distinct node appearing in `pairs`:
    * (`id` LONG, `component` LONG) with `component` = min node id
    * reachable — GraphX connectedComponents' labeling, computed
    * without leaving the DataFrame engine.
    */
  def connectedComponents(pairs: DataFrame, aCol: String = "id_a",
      bCol: String = "id_b", maxRounds: Int = 64): DataFrame =
    connectedComponentsWithRounds(pairs, aCol, bCol, maxRounds)._1

  /** Edge-count bound under which the contraction finishes on the
    * driver: 1M canonical edges = 16 MB collected — far under any
    * driver budget, and the distributed loop's per-round scheduler
    * latency (4+ jobs/round × O(log²) rounds, the dominant cost of
    * q_dedup_cc_incremental at every measured sf) buys nothing at that
    * size. Above the bound the star-contraction loop runs as before
    * and RE-CHECKS each round — a shrinking frontier drops into the
    * local finish the first round it fits (the verdict-r13 "early-exit
    * when the active frontier fits a driver-bounded set" option).
    */
  val LocalEdgeLimit: Int = 1 << 20

  /** [[connectedComponents]] plus the number of contraction rounds it
    * took — the observable the O(log² n) claim is measured by
    * (`tools.StressCc`).
    */
  def connectedComponentsWithRounds(pairs: DataFrame,
      aCol: String = "id_a", bCol: String = "id_b",
      maxRounds: Int = 64,
      localEdgeLimit: Int = LocalEdgeLimit): (DataFrame, Int) = {
    // canonical parent-pointer form: u > v, loops dropped, dups merged
    var edges = pairs.select(
        greatest(col(aCol), col(bCol)).cast(LongType).as("u"),
        least(col(aCol), col(bCol)).cast(LongType).as("v"))
      .filter(col("u") =!= col("v")).distinct()
      .stageBoundary
    var round = 0
    // the stage boundary already measured the live edge set; one count
    // per round decides convergence AND the local-finish early exit
    var n = edges.count()
    var localResult: Option[DataFrame] = None
    var converged = n == 0
    while (!converged && localResult.isEmpty) {
      if (n <= localEdgeLimit) {
        localResult = Some(localUnionFind(edges))
      } else {
      round += 1
      require(round <= maxRounds,
        s"connectedComponents: no fixpoint after $maxRounds rounds")
      // -- large-star: every neighbor LARGER than n attaches to
      //    m = min(Γ(n) ∪ {n})
      val nbrs = edges.select(col("u").as("n"), col("v").as("w"))
        .union(edges.select(col("v").as("n"), col("u").as("w")))
      val mins = nbrs.groupBy("n")
        .agg(min(col("w")).as("mw"))
        .select(col("n"), least(col("mw"), col("n")).as("m"))
      val ls = nbrs.join(mins, "n")
        .filter(col("w") > col("n"))
        .select(col("w").as("u"), col("m").as("v"))
        .filter(col("u") =!= col("v")).distinct()
        .stageBoundary
      // -- small-star: on the parent-pointer orientation (all v < u),
      //    m = min neighbor; u and every smaller neighbor attach to m
      val smins = ls.groupBy("u").agg(min(col("v")).as("m"))
      val ss = ls.join(smins, "u")
        .filter(col("v") =!= col("m"))
        .select(col("v").as("u"), col("m").as("v"))
        .union(smins.select(col("u"), col("m").as("v")))
        .distinct()
        .stageBoundary
      // fixpoint test: the edge set is a star forest, which needs BOTH
      //  (a) no edge target is also a source (pointers land on roots),
      //  (b) every source has exactly ONE parent.
      // (a) alone is NOT sufficient: a node can hold two parents that
      // are each roots — e.g. edges {(2,1),(6,5),(5,2),(6,0)} contract
      // to {(2,0),(2,1),(5,1),(6,0)} after one LS+SS round, where no
      // target is a source yet 2's two root parents (0, 1) still need
      // a merge round. Caught by CcSpec's diamond regression — the
      // first version of this test shipped with exactly that bug.
      // LS/SS leave a true star forest unchanged, so (a)+(b) is exact.
      val srcs = ss.select(col("u").as("n")).distinct()
      val internal = ss.join(srcs, col("v") === col("n"), "left_semi")
      lazy val multiParent = ss.groupBy("u")
        .agg(count(lit(1)).as("__c")).filter(col("__c") > 1)
      converged = internal.isEmpty && multiParent.isEmpty
      edges = ss
      n = edges.count()
      }
    }
    localResult match {
      case Some(df) => (df, round)
      case None =>
        // at the fixpoint every edge points at its component minimum
        val roots = edges.select(col("v").as("id")).distinct()
          .withColumn("component", col("id"))
        (edges.select(col("u").as("id"), col("v").as("component"))
          .union(roots)
          .distinct(), round)
    }
  }

  /** Driver-side finish for an edge set under [[LocalEdgeLimit]]:
    * union-find with path compression, roots kept at the component
    * MINIMUM (union always attaches the larger root under the smaller,
    * so the final find(id) is exactly the distributed labeling — the
    * min id reachable). Output schema matches the distributed path:
    * one (id, component) row per distinct node in the edge set.
    */
  private def localUnionFind(edges: DataFrame): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val es = edges.select(col("u"), col("v")).as[(Long, Long)].collect()
    val parent = new java.util.HashMap[java.lang.Long, java.lang.Long](
      es.length * 2)
    def find(x0: Long): Long = {
      var x = x0
      var p = parent.get(x)
      if (p == null) { parent.put(x, x); return x }
      while (p != x) {
        val gp = parent.get(p.longValue)
        parent.put(x, gp) // path halving
        x = gp.longValue
        p = parent.get(x)
      }
      x
    }
    es.foreach { case (u, v) =>
      val ru = find(u); val rv = find(v)
      if (ru != rv) {
        // min-id root: the component root is always its minimum member
        if (ru < rv) parent.put(rv, ru) else parent.put(ru, rv)
      }
    }
    val out = new Array[(Long, Long)](parent.size)
    var i = 0
    parent.keySet.forEach { k =>
      out(i) = (k.longValue, find(k.longValue)); i += 1
    }
    out.toSeq.toDF("id", "component")
  }

  /** Label a node table with its near-dup cluster canonical: every id
    * in `docs` → min id of its component (itself when unpaired).
    * Drop-in for [[Dedup.resolveClusters]] with the same output
    * schema, minus the RDD round-trip.
    */
  def resolveClustersDf(pairs: DataFrame, docs: DataFrame,
      idCol: String): DataFrame = {
    val labels = connectedComponents(pairs)
      .withColumnRenamed("id", idCol)
    docs.select(col(idCol).cast(LongType))
      .join(labels, Seq(idCol), "left_outer")
      .select(col(idCol),
        coalesce(col("component"), col(idCol)).as("canonical"))
  }

  /** Incremental connected components — fold a batch of NEW pairs into
    * an existing labeling (the daily-ingest face of cluster dedup: the
    * LSH index family emits only increment-vs-history pairs; this
    * merges them into yesterday's clusters).
    *
    * The existing labeling IS a star forest, so history enters the
    * contraction pre-collapsed: the round count is governed by the
    * increment's structure (typically 1–2 rounds), not by how much
    * history has accumulated. Per-round work is linear in
    * |history stars| + |new pairs| — same asymptotics as the
    * label-propagation alternative, without a special-cased algorithm.
    * Nodes whose cluster is untouched keep their label EXCEPT that a
    * merge can lower a component's minimum — exactly full-recompute
    * semantics (spec-pinned equal to recomputing from scratch).
    */
  def addPairs(labels: DataFrame, newPairs: DataFrame,
      aCol: String = "id_a", bCol: String = "id_b",
      maxRounds: Int = 64): DataFrame = {
    val starEdges = labels
      .filter(col("id") =!= col("component"))
      .select(col("id").as(aCol), col("component").as(bCol))
    val merged = connectedComponents(
      starEdges.union(
        newPairs.select(col(aCol).cast(LongType), col(bCol).cast(LongType))),
      aCol, bCol, maxRounds)
    // prior singletons untouched by the increment have no edge to ride
    val selfs = labels.select(col("id"))
      .join(merged, Seq("id"), "left_anti")
      .withColumn("component", col("id"))
    merged.union(selfs)
  }

  /** Quality-aware cluster resolution: the canonical member of each
    * near-dup cluster is the one with the HIGHEST `scoreCol` (tie →
    * lowest id), not blindly the lowest id — the "keep the best copy"
    * policy real curation wants (keep the longest / highest-quality
    * variant, drop the truncated mirror). Use an integer score when
    * the choice must replay across engines.
    *
    * The per-component argmax is ONE unordered window `max` of a
    * (score, −id) struct on the component key (r16, guide §2.4): the
    * old groupBy + join-back consumed the corpus-wide (id, component,
    * score) relation TWICE — re-running the docs scan and the labels
    * join for the probe side — and paid a second component exchange
    * for the join. The window reads the single component-keyed
    * exchange once; a hot component buffers its member rows in the
    * (spillable) window operator — the same occurrence-row bound the
    * join's shuffle side already had, never a pairwise blow-up.
    */
  def resolveClustersBest(pairs: DataFrame, docs: DataFrame,
      idCol: String, scoreCol: String): DataFrame = {
    val labels = connectedComponents(pairs)
      .withColumnRenamed("id", idCol)
    val w = org.apache.spark.sql.expressions.Window.partitionBy("component")
    docs.select(col(idCol).cast(LongType), col(scoreCol))
      .join(labels, Seq(idCol), "left_outer")
      .select(col(idCol),
        coalesce(col("component"), col(idCol)).as("component"),
        col(scoreCol))
      .withColumn("__b", max(struct(col(scoreCol).as("s"),
        (-col(idCol)).as("negid"))).over(w))
      .select(col(idCol), (-col("__b.negid")).cast(LongType).as("canonical"))
  }
}
