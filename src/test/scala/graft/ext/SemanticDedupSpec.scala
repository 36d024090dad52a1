package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SemanticDedupSpec extends SparkSpec {

  // the two smallest ids (the k=2 seed centroids) span distinct
  // directions: 1 = +x, 2 = +y. 3/4 are +x paraphrases, 10/11 +y
  // paraphrases, 20 (-x) lands in the +y cell but is far from
  // everything there — a singleton
  private def vecs = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f)),
      (2L, Seq(0.0f, 1.0f, 0.0f)),
      (3L, Seq(0.999f, 0.04f, 0.0f)),
      (4L, Seq(0.995f, 0.1f, 0.0f)),
      (10L, Seq(0.02f, 0.999f, 0.0f)),
      (11L, Seq(0.03f, 0.998f, 0.0f)),
      (20L, Seq(-1.0f, 0.05f, 0.0f))
    ).toDF("vec_id", "embedding")
  }

  test("near-identical docs collapse to the min-id survivor per cluster") {
    val out = SemanticDedup.semanticDedup(vecs, "vec_id", "embedding",
      k = 2, tau = 0.95)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getBoolean(3))))
      .toMap
    assert(out(1L) == ((1L, true)))
    assert(out(3L) == ((1L, false)))
    assert(out(4L) == ((1L, false)))
    assert(out(2L) == ((2L, true)))
    assert(out(10L) == ((2L, false)))
    assert(out(11L) == ((2L, false)))
    assert(out(20L) == ((20L, true)))
  }

  test("no two survivors in the same cell remain above the threshold") {
    val verdicts = SemanticDedup.semanticDedup(vecs, "vec_id", "embedding",
      k = 2, tau = 0.95)
    val kept = vecs.join(verdicts.filter(col("keep"))
      .select("vec_id", "cell"), "vec_id")
    val survivors = Similarity.cosinePairs(kept, "vec_id", "embedding",
      minCosine = 0.95, blockCol = Some("cell"))
    assert(survivors.isEmpty)
  }

  test("dedup returns exactly the survivors") {
    val kept = SemanticDedup.dedup(vecs, "vec_id", "embedding",
      k = 2, tau = 0.95).select("vec_id")
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 2L, 20L))
  }
}
