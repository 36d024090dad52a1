package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SemDeDup-style semantic deduplication over an embedding column:
  * coarse-quantize the corpus into cells, find within-cell pairs above a
  * cosine threshold, close them transitively, and keep one document per
  * semantic cluster (the smallest id). Near-dup *meaning* — paraphrases,
  * re-encodings, template variants — that the token-level [[Dedup]]
  * family cannot see.
  *
  * Scale shape: cell assignment is a broadcast-literal argmax (one
  * codegen map pass, no shuffle — [[Similarity.assignCells]]); pairing
  * is a distributed equi-join on the cell key, so work scales with the
  * largest cell, never the corpus square ([[Similarity.cosinePairs]]
  * with a mandatory block key); cluster closure runs on the pair
  * residual (O(duplicates)) via GraphX connected components
  * ([[Dedup.resolveClusters]]). No driver-side vector collect beyond
  * the k centroid rows.
  *
  * The default quantizer is [[Similarity.trainCentroids]] — the k
  * smallest-id rows as centroids — which is deterministic and
  * engine-reproducible (that is what lets the whole operator verify
  * against a SQL oracle). A production deployment swaps in sampled
  * k-means++ centroids; every downstream shape is unchanged.
  */
object SemanticDedup {

  /** Per-document semantic-dedup verdicts:
    * (`idCol`, cell, canonical, keep) — `canonical` is the smallest id
    * in the doc's transitive within-cell near-dup cluster (itself for
    * singletons), `keep` = this doc is its cluster's survivor.
    */
  def semanticDedup(df: DataFrame, idCol: String, vecCol: String,
      k: Int, tau: Double,
      centroids: Option[Seq[(Int, Seq[Float])]] = None): DataFrame = {
    // default = the oracle-replayable quantizer; production passes
    // Similarity.trainCentroidsKMeansPP centroids — everything
    // downstream (argmax assignment, blocked pairing, closure) is
    // identical
    val cents = centroids.getOrElse(
      Similarity.trainCentroids(df, idCol, vecCol, k))
    val celled = Similarity.assignCells(
      df.select(col(idCol), col(vecCol)), vecCol, "cell", cents)
    val pairs = Similarity.cosinePairs(celled, idCol, vecCol,
      minCosine = tau, blockCol = Some("cell"))
    val clusters = Dedup.resolveClusters(pairs, celled, idCol)
    celled.select(col(idCol), col("cell"))
      .join(clusters, idCol)
      .withColumn("keep", col(idCol) === col("canonical"))
  }

  /** The deduplicated corpus: one survivor per semantic cluster. */
  def dedup(df: DataFrame, idCol: String, vecCol: String,
      k: Int, tau: Double): DataFrame =
    df.join(semanticDedup(df, idCol, vecCol, k, tau)
        .filter(col("keep")).select(col(idCol)),
      idCol, "left_semi")
}
