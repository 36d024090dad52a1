package graft.ext

import graft.SparkSpec

class SccSpec extends SparkSpec {

  private def run(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val s = spark
    import s.implicits._
    Scc.strongComponents(edges.toDF("src", "dst"), "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("cycles collapse, DAG edges between SCCs do not merge them, " +
    "singletons labeled by themselves, self-loops ignored") {
    val got = run(Seq(
      (1L, 2L), (2L, 3L), (3L, 1L),   // cycle {1,2,3}
      (3L, 5L),                        // DAG edge between SCCs
      (5L, 6L), (6L, 5L),              // cycle {5,6}
      (6L, 9L),                        // singleton 9
      (9L, 9L)))                       // self-loop: no effect
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      5L -> 5L, 6L -> 5L, 9L -> 9L), got.toString)
  }

  test("two directions of the same pair differ: mutual edges merge, " +
    "one-way chains resolve as singletons") {
    // chain of singleton SCCs plus one mutual pair at the tail
    val got = run(Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (5L, 6L), (6L, 5L)))
    assert(got == Map(1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 4L,
      5L -> 5L, 6L -> 5L), got.toString)
  }

  test("DAG chains resolve in O(1) refinement rounds, both id " +
    "orientations (the r7 coloring needed one peel per node)") {
    val s = spark
    import s.implicits._
    def runBounded(edges: Seq[(Long, Long)], rounds: Int) =
      Scc.strongComponents(edges.toDF("src", "dst"), "src", "dst",
        maxRounds = rounds)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val up = (0L until 400L).map(i => (i, i + 1))      // ids ascend
    val down = (0L until 400L).map(i => (i + 1, i))    // ids descend
    for (chain <- Seq(up, down)) {
      val got = runBounded(chain, rounds = 4)
      assert(got.size == 401 && got.forall { case (n, c) => n == c },
        got.take(5).toString)
    }
    // chain of 2-cycles bridged by DAG edges: cycles survive pruning,
    // bridges delete, still bounded rounds
    val cycles = (0L until 50L).flatMap { i =>
      Seq((2 * i, 2 * i + 1), (2 * i + 1, 2 * i),
        (2 * i + 1, 2 * i + 2)).filter(_._2 <= 99L)
    }
    val got = runBounded(cycles, rounds = 6)
    assert((0L until 50L).forall(i =>
      got(2 * i) == 2 * i && got(2 * i + 1) == 2 * i), got.toString)
  }

  test("property: random graphs match a driver-side Tarjan reference") {
    val rng = new scala.util.Random(7)
    for (trial <- 0 until 4) {
      val n = 30 + trial * 10
      val m = n * (1 + trial)
      val edges = Seq.fill(m)(
        (rng.nextInt(n).toLong, rng.nextInt(n).toLong))
        .filter { case (a, b) => a != b }.distinct
      val got = run(edges)
      val want = tarjan(edges)
      assert(got == want, s"trial $trial: " +
        (got.toSet diff want.toSet).take(5).toString)
    }
  }

  /** iterative Tarjan, canonical min-member labels, nodes from edges */
  private def tarjan(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val adj = edges.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val index = scala.collection.mutable.Map.empty[Long, Int]
    val low = scala.collection.mutable.Map.empty[Long, Int]
    val onStack = scala.collection.mutable.Set.empty[Long]
    val stack = scala.collection.mutable.ArrayBuffer.empty[Long]
    val label = scala.collection.mutable.Map.empty[Long, Long]
    var counter = 0
    for (root <- nodes if !index.contains(root)) {
      // explicit work stack: (node, child iterator position)
      val work = scala.collection.mutable.ArrayBuffer((root, 0))
      index(root) = counter; low(root) = counter; counter += 1
      stack += root; onStack += root
      while (work.nonEmpty) {
        val (v, ci) = work.last
        val kids = adj.getOrElse(v, Seq.empty)
        if (ci < kids.length) {
          work(work.length - 1) = (v, ci + 1)
          val w = kids(ci)
          if (!index.contains(w)) {
            index(w) = counter; low(w) = counter; counter += 1
            stack += w; onStack += w
            work += ((w, 0))
          } else if (onStack(w)) low(v) = math.min(low(v), index(w))
        } else {
          work.remove(work.length - 1)
          if (work.nonEmpty) {
            val p = work.last._1
            low(p) = math.min(low(p), low(v))
          }
          if (low(v) == index(v)) {
            val comp = scala.collection.mutable.ArrayBuffer.empty[Long]
            var w = -1L
            do {
              w = stack.remove(stack.length - 1); onStack -= w; comp += w
            } while (w != v)
            val mn = comp.min
            comp.foreach(x => label(x) = mn)
          }
        }
      }
    }
    nodes.map(v => v -> label(v)).toMap
  }

  test("onion topologies: chains of cycles with DAG bridges, dense " +
    "random digraphs — refinement matches Tarjan at bounded rounds") {
    val s = spark
    import s.implicits._
    def runBounded(edges: Seq[(Long, Long)], rounds: Int) =
      Scc.strongComponents(edges.toDF("src", "dst"), "src", "dst",
        maxRounds = rounds)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // chain of 20 3-cycles, each feeding the next (both id
    // orientations — the layered structure where per-layer peeling
    // algorithms pay one round per layer)
    def cycleChain(ids: Seq[Long]): Seq[(Long, Long)] =
      ids.grouped(3).toSeq.flatMap { g =>
        Seq((g(0), g(1)), (g(1), g(2)), (g(2), g(0)))
      } ++ ids.grouped(3).toSeq.sliding(2).map(w => (w(0)(2), w(1)(0))).toSeq
    val asc = (0L until 60L)
    val desc = asc.reverse
    for (ids <- Seq(asc, desc)) {
      val e = cycleChain(ids)
      val got = runBounded(e, rounds = 8)
      assert(got == tarjan(e), s"orientation ${ids.head}: " +
        (got.toSet diff tarjan(e).toSet).take(5).toString)
    }
    // dense random digraphs (m = 4n): big SCCs + a periphery
    val rng = new scala.util.Random(99)
    for (trial <- 0 until 2) {
      val n = 40
      val e = Seq.fill(n * 4)(
        (rng.nextInt(n).toLong, rng.nextInt(n).toLong))
        .filter { case (a, b) => a != b }.distinct
      val got = runBounded(e, rounds = 12)
      assert(got == tarjan(e), s"dense trial $trial")
    }
  }

  test("nested/interlocking cycles form one SCC; determinism across runs") {
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L), (2L, 4L), (4L, 1L),
      (10L, 11L), (11L, 10L))
    val a = run(e)
    val b = run(e)
    assert(a == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L), a.toString)
    assert(a == b)
  }
  test("driver-local finish (default) equals the forced-distributed " +
    "refinement on random digraphs — the r15 local-fast-path pin") {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(7)
    for (trial <- 0 until 2) {
      val n = 60
      val e = Seq.fill(n * 3)(
        (rng.nextInt(n).toLong, rng.nextInt(n).toLong))
        .filter { case (a, b) => a != b }.distinct
      val local = Scc.strongComponents(e.toDF("src", "dst"), "src", "dst")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val dist = Scc.strongComponents(e.toDF("src", "dst"), "src", "dst",
        localEdgeLimit = 0)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(local == dist, s"trial $trial: " +
        (local.toSet diff dist.toSet).take(5).toString)
    }
  }

}
