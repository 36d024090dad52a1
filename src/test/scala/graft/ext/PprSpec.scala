package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PprSpec extends SparkSpec {

  private def ranks(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("2-cycle hand check: integral truncation reproduced exactly " +
    "round by round") {
    val s = spark
    import s.implicits._
    val e = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    // scale 100 makes the truncation visible: r1 = {1:15, 2:85},
    // r2 = {1: 85*85//100 + 15 = 87, 2: 85*15//100 = 12},
    // r3 = {1: 85*12//100 + 15 = 25, 2: 85*87//100 = 73}
    assert(ranks(Ppr.personalized(e, "src", "dst", 1L, rounds = 1,
      scale = 100L)) == Map(1L -> 15L, 2L -> 85L))
    assert(ranks(Ppr.personalized(e, "src", "dst", 1L, rounds = 2,
      scale = 100L)) == Map(1L -> 87L, 2L -> 12L))
    assert(ranks(Ppr.personalized(e, "src", "dst", 1L, rounds = 3,
      scale = 100L)) == Map(1L -> 25L, 2L -> 73L))
  }

  test("property: random graphs match a driver-side integer replay") {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(11)
    for (trial <- 0 until 3) {
      val n = 25 + trial * 15
      val edges = Seq.fill(n * 3)(
        (rng.nextInt(n).toLong, rng.nextInt(n).toLong))
        .filter { case (a, b) => a != b }.distinct
      val rounds = 4 + trial
      val got = ranks(Ppr.personalized(edges.toDF("src", "dst"),
        "src", "dst", source = 0L, rounds = rounds))
      // driver replay of the exact integer recurrence
      val deg = edges.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
      val scale = 1000000000000L
      var r = Map(0L -> scale)
      for (_ <- 1 to rounds) {
        val inflow = scala.collection.mutable.Map.empty[Long, Long]
        for ((u, v) <- edges; ru <- r.get(u))
          inflow(v) = inflow.getOrElse(v, 0L) + ru / deg(u)
        val next = scala.collection.mutable.Map.empty[Long, Long]
        inflow.foreach { case (v, f) => next(v) = 85L * f / 100L }
        next(0L) = next.getOrElse(0L, 0L) + 15L * scale / 100L
        r = next.toMap
      }
      assert(got == r, s"trial $trial: " +
        (got.toSet diff r.toSet).take(5).toString)
    }
  }

  test("mass conservation (minus truncation + dangling loss), source " +
    "dominates its own neighborhood, unreachable nodes absent") {
    val s = spark
    import s.implicits._
    // star around 1 (undirected), a chain hanging off 4, and a
    // disconnected pair 8-9 that must never appear
    val und = Seq((1L, 2L), (1L, 3L), (1L, 4L), (4L, 5L), (8L, 9L))
    val e = (und ++ und.map(_.swap)).toDF("src", "dst")
    val got = ranks(Ppr.personalized(e, "src", "dst", 1L, rounds = 8))
    assert(!got.contains(8L) && !got.contains(9L))
    assert(got(1L) == got.values.max)
    // 2 and 3 are automorphic (both plain leaves of the source):
    // integer arithmetic makes their ranks EXACTLY equal — a float
    // implementation could only assert approximately
    assert(got(2L) == got(3L))
    // total mass never exceeds the injected scale (truncation and the
    // walk only ever LOSE mass)
    assert(got.values.sum <= 1000000000000L)
    assert(got.values.forall(_ >= 0L))
  }
  test("driver-local finish (default) equals the forced-distributed " +
    "recurrence bit-for-bit — the r15 local-fast-path pin") {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(29)
    for (trial <- 0 until 2) {
      val n = 30
      val und = Seq.fill(n * 2)(
        (rng.nextInt(n).toLong, rng.nextInt(n).toLong))
        .filter { case (a, b) => a != b }.distinct
      val e = (und ++ und.map(_.swap)).distinct.toDF("src", "dst")
      val local = ranks(Ppr.personalized(e, "src", "dst", 0L, rounds = 5))
      val dist = ranks(Ppr.personalized(e, "src", "dst", 0L, rounds = 5,
        localEdgeLimit = 0))
      assert(local == dist, s"trial $trial: " +
        (local.toSet diff dist.toSet).take(5).toString)
    }
  }

}
