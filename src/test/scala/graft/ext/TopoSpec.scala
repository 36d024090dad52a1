package graft.ext

import graft.SparkSpec

class TopoSpec extends SparkSpec {

  // diamond DAG 1→{2,3}→4→5, a 3-cycle {10,11,12}, and node 13
  // DOWNSTREAM of the cycle (never removable though acyclic itself),
  // plus isolated-pair 20→21
  private def g = {
    val s = spark
    import s.implicits._
    Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L), (4L, 5L),
      (10L, 11L), (11L, 12L), (12L, 10L), (12L, 13L),
      (20L, 21L)).toDF("src", "dst")
  }

  test("sort: complete layering on the DAG part, -1 for cycle members " +
    "AND their descendants") {
    val got = Topo.sort(g, "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(
      1L -> 0L, 20L -> 0L, 2L -> 1L, 3L -> 1L, 21L -> 1L,
      4L -> 2L, 5L -> 3L,
      10L -> -1L, 11L -> -1L, 12L -> -1L, 13L -> -1L))
  }

  test("fixed-round layers match sort up to the horizon; survivors " +
    "report -1 before convergence") {
    val r2 = Topo.layers(g, "src", "dst", rounds = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // rounds 0 and 1 assigned; 4 and 5 not yet removable → -1
    assert(r2(1L) == 0L && r2(2L) == 1L && r2(3L) == 1L)
    assert(r2(4L) == -1L && r2(5L) == -1L && r2(10L) == -1L)
    val r4 = Topo.layers(g, "src", "dst", rounds = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val conv = Topo.sort(g, "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r4 == conv)
  }

  test("acyclic graph sorts completely; maxRounds guard fires on a " +
    "too-long path") {
    val s = spark
    import s.implicits._
    val chain = (0L until 6L).map(i => (i, i + 1)).toDF("src", "dst")
    val got = Topo.sort(chain, "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == (0L to 6L).map(i => i -> i).toMap)
    intercept[IllegalStateException] {
      Topo.sort(chain, "src", "dst", maxRounds = 3)
    }
  }
  test("driver-local finish (default) equals the forced-distributed " +
    "rounds, fixed and fixpoint faces — the r15 local-fast-path pin") {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(17)
    for (trial <- 0 until 2) {
      val n = 40
      // random DAG-ish edges plus a deliberate cycle
      val e = (Seq.fill(n * 2)(
        (rng.nextInt(n).toLong, rng.nextInt(n).toLong))
        .filter { case (a, b) => a != b } ++
        Seq((100L, 101L), (101L, 102L), (102L, 100L))).distinct
        .toDF("src", "dst")
      val lf = Topo.layers(e, "src", "dst", rounds = 3)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val df2 = Topo.layers(e, "src", "dst", rounds = 3,
        localEdgeLimit = 0)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(lf == df2, s"layers trial $trial")
      val ls = Topo.sort(e, "src", "dst")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val ds = Topo.sort(e, "src", "dst", localEdgeLimit = 0)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(ls == ds, s"sort trial $trial")
    }
  }

}
