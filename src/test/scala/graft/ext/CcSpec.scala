package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CcSpec extends SparkSpec {

  // driver-side reference: plain union-find over the pair list
  private def ufLabels(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { val lo = math.min(ra, rb); parent(math.max(ra, rb)) = lo }
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  private def ccMap(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val s = spark
    import s.implicits._
    Cc.connectedComponents(pairs.toDF("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("chain: a long path collapses to its minimum in few rounds") {
    // 600-node chain — the O(diameter) killer for min-propagation;
    // star contraction must finish inside the 64-round guard
    val pairs = (0L until 599L).map(i => (i, i + 1))
    val got = ccMap(pairs)
    assert(got.size == 600)
    assert(got.values.forall(_ == 0L), "whole chain labels to 0")
  }

  test("star, duplicate and reversed pairs, self-pairs ignored") {
    val pairs = Seq((5L, 1L), (1L, 5L), (1L, 9L), (9L, 1L), (7L, 7L),
      (9L, 5L), (3L, 2L))
    val got = ccMap(pairs)
    // 7-7 is a loop: node 7 appears in no real pair → absent here,
    // resolveClustersDf gives it a self label from the doc side
    assert(got == Map(1L -> 1L, 5L -> 1L, 9L -> 1L, 2L -> 2L, 3L -> 2L))
  }

  test("random graphs match union-find exactly") {
    val rnd = new scala.util.Random(42)
    (0 until 3).foreach { trial =>
      val n = 400
      val pairs = (0 until 500).map { _ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)
      }.filter(p => p._1 != p._2)
      val want = ufLabels(pairs)
      val got = ccMap(pairs)
      assert(got == want, s"trial $trial diverged from union-find")
    }
  }

  test("distributed contraction (localEdgeLimit=0) equals union-find " +
    "and the local-finish path — the loop stays covered now that " +
    "small graphs take the driver-side early exit") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(1234)
    val pairs = (0 until 500).map { _ =>
      (rnd.nextInt(400).toLong, rnd.nextInt(400).toLong)
    }.filter(p => p._1 != p._2)
    val want = ufLabels(pairs)
    val (dist, rounds) = Cc.connectedComponentsWithRounds(
      pairs.toDF("id_a", "id_b"), "id_a", "id_b", 64, localEdgeLimit = 0)
    val got = dist.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
    assert(rounds >= 1)
    // the diamond regression case must also hold through the loop
    val dm = Cc.connectedComponentsWithRounds(
      Seq((1L, 2L), (5L, 6L), (2L, 5L), (0L, 6L)).toDF("id_a", "id_b"),
      "id_a", "id_b", 64, localEdgeLimit = 0)._1
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dm == Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 5L -> 0L, 6L -> 0L))
  }

  test("resolveClustersDf matches the GraphX resolveClusters labeling") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    val docs = (0L until 300L).toDF("doc_id")
    val pairs = (0 until 200).map { _ =>
      (rnd.nextInt(300).toLong, rnd.nextInt(300).toLong)
    }.filter(p => p._1 != p._2)
      .toDF("id_a", "id_b")
    val viaDf = Cc.resolveClustersDf(pairs, docs, "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaGx = Dedup.resolveClusters(pairs, docs, "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaDf == viaGx)
  }

  test("regression: multi-parent intermediate state must not be " +
    "mistaken for convergence (diamond through two roots)") {
    // edges {(2,1),(6,5),(5,2),(6,0)} contract in one LS+SS round to
    // {(2,0),(2,1),(5,1),(6,0)}: no target is a source, but node 2
    // holds TWO root parents — the components are not merged yet. The
    // first star-forest convergence test accepted this state and split
    // one component into {0,6} and {1,2,5}.
    val got = ccMap(Seq((1L, 2L), (5L, 6L), (2L, 5L), (0L, 6L)))
    assert(got == Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 5L -> 0L, 6L -> 0L),
      s"diamond did not fully merge: $got")
  }

  test("addPairs == full recompute over the union, including " +
    "cross-batch merges that lower a component minimum") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(99)
    val batch1 = (0 until 150).map { _ =>
      (rnd.nextInt(200).toLong + 100, rnd.nextInt(200).toLong + 100)
    }.filter(p => p._1 != p._2)
    // batch 2 introduces SMALLER ids (0..99) and bridges old clusters
    val batch2 = (0 until 80).map { _ =>
      (rnd.nextInt(300).toLong, rnd.nextInt(300).toLong)
    }.filter(p => p._1 != p._2)
    val labels1 = Cc.connectedComponents(batch1.toDF("id_a", "id_b"))
      // give some singleton history too
      .union(Seq((900L, 900L), (901L, 901L)).toDF("id", "component"))
    val got = Cc.addPairs(labels1, batch2.toDF("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val full = Cc.connectedComponents((batch1 ++ batch2).toDF("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every union-graph node must agree with the full recompute
    full.foreach { case (id, comp) =>
      assert(got(id) == comp, s"node $id: got ${got(id)}, want $comp")
    }
    // untouched singleton history keeps its self-label
    assert(got(900L) == 900L && got(901L) == 901L)
    assert(got.size == full.size + 2)
  }

  test("resolveClustersBest keeps the highest-scoring member, " +
    "min id on ties, self for singletons") {
    val s = spark
    import s.implicits._
    // component {1,2,3}: scores 5,9,9 → best = id 2 (tie 2 vs 3)
    // component {7,8}: scores 4,1 → best = 7; singleton 9 → itself
    val docs = Seq((1L, 5L), (2L, 9L), (3L, 9L), (7L, 4L), (8L, 1L),
      (9L, 2L)).toDF("doc_id", "sc")
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 8L)).toDF("id_a", "id_b")
    val got = Cc.resolveClustersBest(pairs, docs, "doc_id", "sc")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 2L, 2L -> 2L, 3L -> 2L,
      7L -> 7L, 8L -> 7L, 9L -> 9L))
  }

  test("empty pair set: every doc is its own canonical") {
    val s = spark
    import s.implicits._
    val docs = Seq(3L, 8L).toDF("doc_id")
    val pairs = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    val got = Cc.resolveClustersDf(pairs, docs, "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(3L -> 3L, 8L -> 8L))
  }
}
