package graft.ext

import graft.SparkSpec

class StatsSpec extends SparkSpec {

  test("exactQuantilesInt equals the sorted-rank definition, " +
    "boundary ranks included") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(11)
    val rows = (0 until 1000).map(i =>
      (s"g${i % 3}", rnd.nextInt(50).toLong))
    val df = rows.toDF("g", "v")
    val got = Stats.exactQuantilesInt(df, "g", "v", Seq(500, 900, 1000))
      .collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    rows.groupBy(_._1).foreach { case (g, grp) =>
      val sorted = grp.map(_._2).sorted
      val n = sorted.length
      Seq(500, 900, 1000).foreach { q =>
        // smallest v with cum*1000 >= q*n == element at 1-based rank
        // ceil(q*n/1000)
        val rank = (q.toLong * n + 999) / 1000
        val want = sorted((rank - 1).toInt)
        assert(got((g, q)) == want, s"group $g q=$q")
      }
    }
  }

  test("even-count median takes the LOWER middle (integer rank rule)") {
    val s = spark
    import s.implicits._
    val df = Seq(("a", 1L), ("a", 2L), ("a", 3L), ("a", 4L)).toDF("g", "v")
    val got = Stats.exactQuantilesInt(df, "g", "v", Seq(500))
      .collect().map(r => r.getLong(2)).head
    assert(got == 2L)
  }
}
