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
    "one-way chains peel as singletons (several outer rounds)") {
    // chain of singleton SCCs — exercises repeated peeling — plus one
    // mutual pair at the tail
    val got = run(Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (5L, 6L), (6L, 5L)))
    assert(got == Map(1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 4L,
      5L -> 5L, 6L -> 5L), got.toString)
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
}
