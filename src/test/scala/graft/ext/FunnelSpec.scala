package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.Row

class FunnelSpec extends SparkSpec {

  private def run(events: Seq[(Long, String, Long)]): Map[Long, Row] = {
    val s = spark
    import s.implicits._
    Funnel.stages(events.toDF("user_id", "et", "t"),
      "user_id", "et", "t", Seq("a", "b", "c"))
      .collect().map(r => r.getLong(0) -> r).toMap
  }

  test("first-touch chaining: stage times must strictly increase from " +
    "the EARLIEST entry, not the fastest chain") {
    val got = run(Seq(
      // user 1 completes: a@10, first b after 10 is 30, first c after 30 is 40
      (1L, "a", 10L), (1L, "b", 5L), (1L, "b", 30L), (1L, "c", 25L),
      (1L, "c", 40L),
      // user 2: a@50, but every b is BEFORE it → stage 1, later c ignored
      (2L, "b", 10L), (2L, "a", 50L), (2L, "c", 60L),
      // user 3: never enters the funnel despite b and c events
      (3L, "b", 1L), (3L, "c", 2L)))
    assert(got(1L).getInt(4) == 3)
    assert(got(1L).getLong(1) == 10L && got(1L).getLong(2) == 30L &&
      got(1L).getLong(3) == 40L)
    assert(got(2L).getInt(4) == 1)
    assert(got(2L).isNullAt(2) && got(2L).isNullAt(3))
    assert(got(3L).getInt(4) == 0)
    assert(got(3L).isNullAt(1))
  }

  test("property: random event streams match a driver-side reference, " +
    "with and without a conversion deadline") {
    val s = spark
    import s.implicits._
    val steps = Seq("a", "b", "c")
    val types = Array("a", "b", "c", "x")
    val rnd = new scala.util.Random(5)
    val events = (0 until 2000).map { _ =>
      (rnd.nextInt(40).toLong, types(rnd.nextInt(4)), rnd.nextInt(500).toLong)
    }
    def reference(gap: Option[Long]): Map[Long, (Seq[Option[Long]], Int)] =
      events.groupBy(_._1).map { case (u, evs) =>
        val ts = scala.collection.mutable.ArrayBuffer[Long]()
        steps.foreach { st =>
          val lo = ts.lastOption
          val cand = evs.filter(_._2 == st).map(_._3)
            .filter(t => lo.forall(p =>
              t > p && gap.forall(g => t <= p + g)))
          if (ts.length == steps.indexOf(st) && cand.nonEmpty)
            ts += cand.min
        }
        u -> (steps.indices.map(i => ts.lift(i)), ts.length)
      }
    Seq(None, Some(60L), Some(5L)).foreach { gap =>
      val got = Funnel.stages(events.toDF("user_id", "et", "t"),
        "user_id", "et", "t", steps, gap)
        .collect().map { r =>
          r.getLong(0) -> (Seq(1, 2, 3).map(i =>
            if (r.isNullAt(i)) None else Some(r.getLong(i))),
            r.getInt(4))
        }.toMap
      val want = reference(gap)
      assert(got == want, s"gap=$gap diverged")
    }
  }

  test("retention counts each user once per active period against " +
    "their first-touch cohort") {
    val s = spark
    import s.implicits._
    val events = Seq(
      (1L, 5L), (1L, 15L), (1L, 25L), (1L, 27L), // cohort 0, p 0/1/2/2
      (2L, 12L), (2L, 33L)) // cohort 1, offsets 0 and 2
      .toDF("user_id", "t")
    val got = Funnel.retention(events, "user_id", "t", 10L)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(got == Map((0L, 0) -> 1L, (0L, 1) -> 1L, (0L, 2) -> 1L,
      (1L, 0) -> 1L, (1L, 2) -> 1L))
  }

  test("equal timestamps do not chain (strictly-after semantics)") {
    val got = run(Seq((7L, "a", 100L), (7L, "b", 100L), (7L, "b", 101L),
      (7L, "c", 101L)))
    // b must be strictly after a (101), c strictly after that → none
    assert(got(7L).getLong(2) == 101L)
    assert(got(7L).isNullAt(3))
    assert(got(7L).getInt(4) == 2)
  }
}
