package graft.planner

import graft.graph.GraphProvider
import graft.pattern.{EdgePat, MatchPattern}
import graft.stats.GraphStats

import scala.collection.mutable

/** Traversal steps emitted by the cost-based search; executed in order by
  * `MatchPlanner.execute`.
  */
sealed trait Step
/** materialize a node table (cross-joined if a component is already open) */
final case class StartNode(alias: String) extends Step
/** traverse an edge into an unbound endpoint.
  * @param reversed  true → expand from the bound sink via the reversed
  *                  adjacency column into the unbound source
  * @param broadcastNode  hint: the node table being joined is small
  *                  enough to broadcast
  * @param preMaterialize  explode the NEW node's own adjacency before the
  *                  join (build-side pre-materialization) instead of the
  *                  frontier's — chosen when the new node's side of the
  *                  edge has avg degree < 1, so the explode shrinks the
  *                  build relation (`MatchGraphInterface.cs:108-114`)
  */
final case class ExpandEdge(edge: EdgePat, reversed: Boolean,
    broadcastNode: Boolean, preMaterialize: Boolean = false) extends Step
/** both endpoints already bound: edge becomes an existence filter */
final case class BindEdge(edge: EdgePat) extends Step
/** var-length path splice: the expansion is seeded at one endpoint —
  * `backward = true` seeds at `dst` and walks the REVERSED adjacency
  * (sink-seeded paths expand from the selective end,
  * `MatchGraphInterface.cs:118-129`)
  */
final case class ExpandPath(src: String, edge: String, dst: String,
    backward: Boolean) extends Step

/** Faithful port of the reference's pattern-join-order search
  * (`TranslateMatchClauseVisitor.cs:1631-1727` + cost model
  * `MatchComponent.cs:561-875`, SURVEY §4.2):
  *
  *  - state = component (bound aliases, emitted steps, cost, cardinality);
  *  - init: one single-node component per pattern node;
  *  - expand: per unbound node joinable to the component, two physical
  *    alternatives — "loop" (traverse from the frontier along connecting
  *    edges: cost = |comp| * ∏deg * log₅₁₂|nodeTable|) and "hash" (build
  *    the node side, probe the component: cost = |build| + |probe|);
  *  - beam: keep the best `MaxStates` (=100, `MaxStates` in the
  *    reference) states per size class, dedup by bound-set;
  *  - components are planned independently, then cross-joined
  *    (`TranslateMatchClauseVisitor.cs:1004-1030`).
  *
  * In Spark the two alternatives emit the same logical steps — the
  * physical analogue of "loop from a small frontier" is broadcasting the
  * node table under AQE — so the cost model decides ORDER plus a
  * broadcast hint, and Catalyst/AQE pick the join implementation.
  */
object CostPlanner {

  val MaxStates = 100                 // beam width (reference MaxStates)
  val LoopLogBase: Double = math.log(512.0) // B-tree fanout proxy
  val BroadcastRowThreshold = 500000L // node side small enough to broadcast

  /** The reference's var-length-path cardinality estimate
    * (`TranslateMatchClauseVisitor.cs:1489-1502`): per seed node, a path
    * of length in [minLen, maxLen] fans out ≈ deg^maxLen − deg^(minLen−1)
    * when deg > 1; unbounded (`maxLen = -1`) with deg > 1 diverges
    * (`double.MaxValue`); deg ≤ 1 stays deg (the walk doesn't grow).
    */
  def pathDegree(deg: Double, minLen: Int, maxLen: Int): Double =
    if (deg <= 1.0) deg
    else if (maxLen == -1) Double.MaxValue
    else math.pow(deg, maxLen) -
      (if (minLen > 0) math.pow(deg, minLen - 1) else 0.0)

  final case class Plan(steps: Seq[Step], cost: Double, cardinality: Double)

  private final case class State(
      bound: Set[String], steps: Vector[Step], cost: Double, size: Double)

  /** @param nodeSel per-alias predicate selectivity in (0,1], default 1
    * @param filteredIdHists per-alias histogram of the SAMPLED GlobalNodeIds
    *   that survive the alias's own predicates — lets expansion
    *   cardinality see where the filtered ids actually sit in the id
    *   domain (the reference's histogram intersection,
    *   `Statistics.cs:68-216`) instead of assuming uniformity
    */
  def plan(g: GraphProvider, pattern: MatchPattern, stats: GraphStats,
      nodeSel: Map[String, Double] = Map.empty,
      filteredIdHists: Map[String, graft.stats.Histogram] = Map.empty): Plan = {
    val tableOf = pattern.nodes.map(n => n.alias -> n.table).toMap
    def sel(a: String) = nodeSel.getOrElse(a, 1.0)
    def rowsEff(a: String) = math.max(stats.tableRows(tableOf(a)) * sel(a), 1.0)

    // connected components over the pattern (undirected union-find,
    // TranslateMatchClauseVisitor.cs:371-401)
    val parent = mutable.Map(pattern.nodes.map(n => n.alias -> n.alias): _*)
    def find(a: String): String =
      if (parent(a) == a) a else { val r = find(parent(a)); parent(a) = r; r }
    pattern.edges.foreach(e => parent(find(e.src)) = find(e.dst))
    val components = pattern.nodes.groupBy(n => find(n.alias)).values.toSeq
      .sortBy(_.map(_.alias).min)

    val planned = components.map { nodes =>
      val aliases = nodes.map(_.alias).toSet
      val edges = pattern.edges.filter(e => aliases(e.src))
      planComponent(aliases, edges, tableOf, stats, sel, rowsEff,
        filteredIdHists)
    }
    // cross-join components, cheapest-cardinality first
    val ordered = planned.sortBy(_.cardinality)
    Plan(ordered.flatMap(_.steps),
      ordered.map(_.cost).sum,
      ordered.map(_.cardinality).product)
  }

  private def planComponent(
      aliases: Set[String], edges: Seq[EdgePat],
      tableOf: Map[String, String], stats: GraphStats,
      sel: String => Double, rowsEff: String => Double,
      filteredIdHists: Map[String, graft.stats.Histogram] = Map.empty): Plan = {

    def deg(e: EdgePat, reversed: Boolean): Double = {
      val st = stats.edgeStat(tableOf(e.src), e.edge)
      val d = if (reversed) st.avgRevDeg else st.avgDeg
      math.max(d, 0.001)
    }

    // self-loop edges (src == dst, MATCH a-[e]->a) can never drive an
    // expansion — both endpoints bind at once, so they attach as
    // existence filters (BindEdge) the moment their alias binds
    val (selfEdges, expandEdges) = edges.partition(e => e.src == e.dst)
    val selfByAlias = selfEdges.groupBy(_.src).withDefaultValue(Seq.empty)
    def withSelfLoops(a: String, size0: Double): (Vector[Step], Double) = {
      var size = size0
      val steps = selfByAlias(a).map { e =>
        // P(a fixed node carries a self-edge) ≈ deg / |table| under
        // uniformity — same estimate as bound-bound extra edges
        size *= deg(e, reversed = false) / rowsEff(e.dst)
        BindEdge(e)
      }.toVector
      (steps, math.max(size, 1.0))
    }

    var beam: Map[Set[String], State] = aliases.map { a =>
      val (ss, sz) = withSelfLoops(a, rowsEff(a))
      Set(a) -> State(Set(a), StartNode(a) +: ss, cost = 0.0, size = sz)
    }.toMap

    var best: Option[State] = if (aliases.size == 1) beam.values.headOption else None

    while (beam.nonEmpty && beam.keys.exists(_.size < aliases.size)) {
      val next = mutable.Map[Set[String], State]()
      def offer(s: State): Unit = {
        val cur = next.get(s.bound)
        if (cur.forall(_.cost > s.cost)) next(s.bound) = s
      }
      beam.values.foreach { st =>
        if (st.bound.size == aliases.size) offer(st)
        else {
          // candidate units: unbound nodes with >=1 edge to the component
          val candidates = aliases.diff(st.bound).filter { u =>
            expandEdges.exists(e => (e.src == u && st.bound(e.dst)) ||
              (e.dst == u && st.bound(e.src)))
          }
          candidates.foreach { u =>
            val joining0 = expandEdges.filter(e =>
              (e.src == u && st.bound(e.dst)) || (e.dst == u && st.bound(e.src)))
            // cheapest-first: traverse the lowest-degree joining edge, the
            // rest become post-join filters (MatchComponent.cs:577-581)
            val joining = joining0.sortBy(e => deg(e, reversed = e.src == u))
            val first = joining.head
            val fwd = first.src != u // component holds the source → forward explode
            val d = deg(first, reversed = !fwd)
            var newSize = st.size * d * sel(u)
            // histogram refinement of the expansion estimate: P(an edge
            // endpoint lands on a predicate-surviving u node) from the
            // edge-endpoint-sample × filtered-id-sample intersection
            // instead of the uniform sel(u). Forward expansions read the
            // sampled sink ids; reversed expansions the sampled source
            // ids (the mirror, `Statistics.cs:68-216`). Scaled back to
            // full-table terms:
            // p = joined · sel · |U| / (|endpointSample| · |filteredSample|)
            // — reduces to sel(u) when both sides are uniform.
            val endpointHist =
              if (fwd) stats.sinkHists.get((tableOf(first.src), first.edge))
              else stats.srcHists.get((tableOf(first.src), first.edge))
            for {
              sh <- endpointHist
              fh <- filteredIdHists.get(u)
              if sh.totalRows > 0 && fh.totalRows > 0
            } {
              val (joined, _) = graft.stats.Histogram.joinSelectivity(sh, fh)
              val p = joined * sel(u) * stats.tableRows(tableOf(u)) /
                (sh.totalRows * fh.totalRows)
              newSize = st.size * d * math.min(p, 1.0)
            }
            val extraSteps = joining.tail.map { e =>
              // An extra bound-bound edge filters. Expected match fraction
              // P(edge src→dst exists for a fixed pair) = deg/|dst| under
              // uniformity; with sink-sample + id histograms available
              // (Statistics.cs join-selectivity) the edge-mass actually
              // landing in the bound dst's id range refines it — e.g. a
              // predicate-filtered dst whose ids receive no edges → ~0.
              val est = stats.edgeStat(tableOf(e.src), e.edge)
              val histFactor = for {
                sh <- stats.sinkHists.get((tableOf(e.src), e.edge))
                ih <- stats.idHists.get(tableOf(e.dst))
                if est.count > 0 && ih.totalRows > 0
              } yield {
                val (joined, _) = graft.stats.Histogram.joinSelectivity(sh, ih)
                est.avgDeg * joined /
                  (est.count.toDouble * math.max(ih.totalRows, 1.0))
              }
              newSize *= histFactor.getOrElse(
                deg(e, reversed = false) / rowsEff(e.dst))
              BindEdge(e)
            }
            val uRows = rowsEff(u)
            val loopCost = st.size * d * (math.log(math.max(uRows, 2.0)) / LoopLogBase)
            val hashCost = uRows + st.size
            val stepCost = math.min(loopCost, hashCost)
            val broadcast = uRows <= BroadcastRowThreshold
            // pre-materialize when exploding the NEW node's side of the
            // edge shrinks it (its avg degree on that side < 1)
            val uSideDeg = deg(first, reversed = fwd)
            val step = ExpandEdge(first, reversed = !fwd,
              broadcastNode = broadcast, preMaterialize = uSideDeg < 1.0)
            val (selfSteps, sizeWithSelf) = withSelfLoops(u, newSize)
            offer(State(st.bound + u,
              (st.steps :+ step) ++ extraSteps ++ selfSteps,
              st.cost + stepCost, sizeWithSelf))
          }
        }
      }
      // beam cap: keep the cheapest MaxStates states
      beam = next.values.toSeq.sortBy(_.cost).take(MaxStates)
        .map(s => s.bound -> s).toMap
      beam.values.filter(_.bound.size == aliases.size).foreach { s =>
        if (best.forall(_.cost > s.cost)) best = Some(s)
      }
    }
    val b = best.getOrElse(throw new IllegalStateException(
      s"no plan found for component $aliases"))
    Plan(b.steps, b.cost, b.size)
  }
}
