package graft.ext

import graft.SparkSpec

class LpaSpec extends SparkSpec {

  test("bridged triangles settle into two communities; the bridge " +
    "never merges them (Cc would); deterministic min-label ties") {
    val s = spark
    import s.implicits._
    val und = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (10L, 11L), (11L, 12L), (10L, 12L), (3L, 10L))
    val e = (und ++ und.map(_.swap)).toDF("src", "dst")
    val got = Lpa.propagate(e, "src", "dst", rounds = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // hand-traced: triangle {1,2,3} settles on 1; {10,11,12} on 3
    // (node 10's tie at round 2 resolves to the smaller label 3,
    // which then wins its triangle)
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 3L, 11L -> 3L, 12L -> 3L), got.toString)
    // connectivity alone would glue everything into ONE component
    val cc = Cc.connectedComponents(e, "src", "dst")
      .select("component").distinct().count()
    assert(cc == 1L)
  }

  test("property: random graphs match a driver-side synchronous replay") {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(23)
    for (trial <- 0 until 3) {
      val n = 20 + trial * 12
      val edges = Seq.fill(n * 2)(
        (rng.nextInt(n).toLong, rng.nextInt(n).toLong)).distinct
      val rounds = 3 + trial
      val got = Lpa.propagate(edges.toDF("src", "dst"), "src", "dst",
        rounds).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
      val inAdj = edges.groupBy(_._2).map { case (k, v) => k -> v.map(_._1) }
      var lab = nodes.map(v => v -> v).toMap
      for (_ <- 1 to rounds) {
        lab = nodes.map { v =>
          inAdj.get(v) match {
            case None => v -> lab(v)
            case Some(ins) =>
              val counts = ins.map(lab).groupBy(identity)
                .map { case (l, xs) => l -> xs.size }
              val mc = counts.values.max
              v -> counts.filter(_._2 == mc).keys.min
          }
        }.toMap
      }
      assert(got == lab, s"trial $trial: " +
        (got.toSet diff lab.toSet).take(5).toString)
    }
  }

  test("isolated-per-direction nodes keep labels; a directed star " +
    "adopts its hub") {
    val s = spark
    import s.implicits._
    // directed: hub 5 points at leaves; leaves have in-degree 1 (hub),
    // hub has NO in-edges and must keep its own label
    val e = Seq((5L, 6L), (5L, 7L), (5L, 8L)).toDF("src", "dst")
    val got = Lpa.propagate(e, "src", "dst", rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(5L -> 5L, 6L -> 5L, 7L -> 5L, 8L -> 5L))
  }
  test("driver-local finish (default) equals the forced-distributed " +
    "rounds on random graphs — the r15 local-fast-path pin") {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(13)
    for (trial <- 0 until 2) {
      val n = 50
      val und = Seq.fill(n * 2)(
        (rng.nextInt(n).toLong, rng.nextInt(n).toLong))
        .filter { case (a, b) => a != b }.distinct
      val e = (und ++ und.map(_.swap)).toDF("src", "dst")
      val local = Lpa.propagate(e, "src", "dst", rounds = 3)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val dist = Lpa.propagate(e, "src", "dst", rounds = 3,
        localEdgeLimit = 0)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(local == dist, s"trial $trial: " +
        (local.toSet diff dist.toSet).take(5).toString)
    }
  }

}
