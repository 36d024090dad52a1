package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Property coverage for the cutoff-key TOP ... WITH TIES shape: the
  * distributed plan must equal `RANK() <= k` on every input, including
  * the null placements the hand-rolled lexicographic predicate
  * branches on (ASC nulls first / DESC nulls last), multi-key
  * tie-breaks, tiny inputs (< k rows) and k = 0.
  */
class TiesCutoffSpec extends SparkSpec {

  test("topWithTies == RANK()<=k across key directions, null-laden " +
    "columns, multi-key combos, deterministic seeds") {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(42)
    def gen(n: Int): Seq[(Long, java.lang.Long, java.lang.Double)] =
      (0 until n).map { i =>
        val a: java.lang.Long =
          if (rng.nextInt(5) == 0) null else Long.box(rng.nextInt(6).toLong)
        val b: java.lang.Double =
          if (rng.nextInt(7) == 0) null
          else Double.box((rng.nextInt(40) / 4.0))
        (i.toLong, a, b)
      }
    for (n <- Seq(1, 7, 60); (da, db) <- Seq((true, false), (false, true),
        (true, true), (false, false)); k <- Seq(0, 1, 5, 60)) {
      val df = gen(n).toDF("id", "a", "b").repartition(5)
      val keys = Seq((col("a"), da), (col("b"), db))
      val got = TiesCutoff.topWithTies(df, keys, k)
        .select("id").collect().map(_.getLong(0)).toSet
      val ord = Seq(
        if (da) col("a").desc else col("a").asc,
        if (db) col("b").desc else col("b").asc)
      val want = df.withColumn("rk",
          rank().over(Window.orderBy(ord: _*)))
        .filter(col("rk") <= k)
        .select("id").collect().map(_.getLong(0)).toSet
      assert(got == want,
        s"n=$n k=$k da=$da db=$db: got ${got.size} want ${want.size} " +
          s"diff ${(got diff want) ++ (want diff got)}")
    }
  }

  test("all-null key column: DESC admits nothing past the null cutoff " +
    "except nulls; ASC the same — whole input returned when it ties") {
    val s = spark
    import s.implicits._
    val df = Seq.tabulate(10)(i => (i.toLong, null: java.lang.Long))
      .toDF("id", "a")
    for (desc <- Seq(true, false)) {
      val got = TiesCutoff.topWithTies(df, Seq((col("a"), desc)), 3)
      // every row ties on the null key → RANK()<=3 keeps all 10
      assert(got.count() == 10, s"desc=$desc")
    }
  }
}
