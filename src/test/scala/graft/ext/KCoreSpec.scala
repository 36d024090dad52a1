package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class KCoreSpec extends SparkSpec {

  /** undirected edge list as both-direction rows */
  private def undirected(pairs: Seq[(Long, Long)]) = {
    val s = spark
    import s.implicits._
    (pairs ++ pairs.map(p => (p._2, p._1))).toDF("src", "dst")
  }

  // a 4-clique {1,2,3,4} with a pendant path 4-5-6 and an isolated
  // edge 7-8: the 3-core is exactly the clique; the 2-core is also
  // exactly the clique (5 and 6 peel in cascade); 1-core is everything
  private def g = undirected(Seq(
    (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
    (4L, 5L), (5L, 6L), (7L, 8L)))

  test("core extracts exactly the k-core with cascading removal") {
    def coreNodes(k: Int) =
      KCore.core(g, "src", "dst", k).collect().map(_.getLong(0)).toSet
    assert(coreNodes(3) == Set(1L, 2L, 3L, 4L))
    // 2-core: 6 has degree 1 → peels; then 5 drops to degree 1 → peels
    // (the cascade a single-pass degree filter would miss)
    assert(coreNodes(2) == Set(1L, 2L, 3L, 4L))
    assert(coreNodes(1) == Set(1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L))
    assert(coreNodes(4).isEmpty)
    // degrees reported are within-core degrees
    val d3 = KCore.core(g, "src", "dst", 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(d3.values.toSet == Set(3L))
  }

  test("fixed-round peel equals core once rounds cover the cascade, " +
    "and reports the intermediate state before") {
    val conv = KCore.core(g, "src", "dst", 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // round 1 removes only 6 — 5 still present with its stale degree
    val r1 = KCore.peel(g, "src", "dst", k = 2, rounds = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r1.contains(5L) && r1(5L) == 1L)
    // two more rounds reach the fixpoint
    val r3 = KCore.peel(g, "src", "dst", k = 2, rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r3 == conv)
  }

  test("core fails loudly when maxRounds is too small for the cascade") {
    intercept[IllegalStateException] {
      KCore.core(g, "src", "dst", k = 2, maxRounds = 1)
    }
  }
  test("driver-local finish (default) equals the forced-distributed " +
    "peels, fixed and fixpoint faces — the r15 local-fast-path pin") {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(23)
    for (trial <- 0 until 2) {
      val n = 40
      val und = Seq.fill(n * 3)(
        (rng.nextInt(n).toLong, rng.nextInt(n).toLong))
        .filter { case (a, b) => a != b }.distinct
      val e = (und ++ und.map(_.swap)).distinct.toDF("src", "dst")
      val lp = KCore.peel(e, "src", "dst", k = 3, rounds = 2)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val dp = KCore.peel(e, "src", "dst", k = 3, rounds = 2,
        localEdgeLimit = 0)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(lp == dp, s"peel trial $trial")
      val lc = KCore.core(e, "src", "dst", k = 3)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val dc = KCore.core(e, "src", "dst", k = 3, localEdgeLimit = 0)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(lc == dc, s"core trial $trial")
    }
  }

}
