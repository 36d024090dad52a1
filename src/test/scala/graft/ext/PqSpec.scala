package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Product quantization (PQ / IVF-PQ): per-subspace codebooks compress
  * a vector to m int codes (the 100 TB ANN memory story — dim·4 bytes
  * → m bytes per corpus row), ADC search touches the corpus only
  * through those codes. On clusterable data the PQ top-k approximates
  * the exact top-k; training and encoding are deterministic per seed.
  */
class PqSpec extends SparkSpec {

  private val dim = 32
  private val nClusters = 8
  private val perCluster = 60

  private lazy val clustered = {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(13L)
    def unit(v: Array[Double]) = {
      val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n)
    }
    val centers = Array.fill(nClusters)(
      unit(Array.fill(dim)(rng.nextGaussian())))
    (0 until nClusters).flatMap { c =>
      (0 until perCluster).map { j =>
        val p = unit(centers(c).map(_ + 0.1 * rng.nextGaussian()))
        (c.toLong * 1000 + j, p.map(_.toFloat).toSeq, c)
      }
    }.toDF("vec_id", "embedding", "true_cluster")
  }

  test("PQ k-means training is deterministic; codebooks have the " +
    "requested shape") {
    val a = Similarity.trainPqCodebooksKMeans(
      clustered, "vec_id", "embedding", m = 4, codes = 16, seed = 5L)
    val b = Similarity.trainPqCodebooksKMeans(
      clustered, "vec_id", "embedding", m = 4, codes = 16, seed = 5L)
    assert(a == b, "same seed must reproduce the same codebooks")
    assert(a.length == 4 && a.forall(_.length == 16) &&
      a.forall(_.forall(_.length == dim / 4)))
  }

  test("encodePq emits m in-range codes per row, map-only") {
    val cbs = Similarity.trainPqCodebooksKMeans(
      clustered, "vec_id", "embedding", m = 4, codes = 16, seed = 5L)
    val enc = Similarity.encodePq(clustered, "embedding", "pq", cbs)
    val bad = enc.filter(size(col("pq")) =!= 4 ||
      exists(col("pq"), c => c < 0 || c >= 16)).count()
    assert(bad == 0)
    // the encode is a single map-only projection: no exchange in plan
    val plan = enc.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"encode plan shuffles:\n$plan")
  }

  test("ADC top-k with trained codebooks recovers the exact neighbors' " +
    "clusters (recall within cluster structure)") {
    val cbs = Similarity.trainPqCodebooksKMeans(
      clustered, "vec_id", "embedding", m = 8, codes = 32, seed = 5L)
    val enc = Similarity.encodePq(clustered, "embedding", "pq", cbs)
    val queries = clustered.filter(col("vec_id") % 1000 < 3)
    val pq = Similarity.pqTopK(enc, queries, "vec_id", "embedding",
      "pq", cbs, k = 5)
    // every ADC neighbor must come from the query's true cluster: the
    // inter-cluster gap dwarfs the quantization error on this corpus
    val truth = clustered.select(col("vec_id"), col("true_cluster"))
    val joined = pq
      .join(truth.withColumnRenamed("vec_id", "qid")
        .withColumnRenamed("true_cluster", "qc"), "qid")
      .join(truth.withColumnRenamed("vec_id", "nid")
        .withColumnRenamed("true_cluster", "nc"), "nid")
    val total = joined.count()
    assert(total == nClusters * 3 * 5L)
    val cross = joined.filter(col("qc") =!= col("nc")).count()
    assert(cross.toDouble / total <= 0.05,
      s"$cross of $total ADC neighbors crossed clusters")
  }

  test("IVF-PQ cell restriction composes: neighbors stay in the " +
    "query's cell and match plain PQ restricted to the cell") {
    val cbs = Similarity.trainPqCodebooksKMeans(
      clustered, "vec_id", "embedding", m = 4, codes = 16, seed = 5L)
    val coarse = Similarity.trainCentroidsKMeansPP(
      clustered, "vec_id", "embedding", nClusters, seed = 11L)
    val celled = Similarity.assignCells(clustered, "embedding", "cell", coarse)
    val enc = Similarity.encodePq(celled, "embedding", "pq", cbs)
    val queries = enc.filter(col("vec_id") % 1000 < 2)
    val ivfpq = Similarity.pqTopK(enc, queries, "vec_id", "embedding",
      "pq", cbs, k = 3, cellCol = Some("cell")).collect()
    val cells = enc.select(col("vec_id"), col("cell")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val qCells = queries.select(col("vec_id"), col("cell")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(ivfpq.nonEmpty)
    ivfpq.foreach { r =>
      assert(cells(r.getLong(1)) == qCells(r.getLong(0)),
        s"neighbor ${r.getLong(1)} left query ${r.getLong(0)}'s cell")
    }
  }

  test("writePqIndex round-trips codes and codebooks; cell layout is " +
    "partition-pruned") {
    val s = spark
    val cbs = Similarity.trainPqCodebooksKMeans(
      clustered, "vec_id", "embedding", m = 4, codes = 16, seed = 5L)
    val coarse = Similarity.trainCentroids(clustered, "vec_id", "embedding", 4)
    val celled = Similarity.assignCells(clustered, "embedding", "cell", coarse)
    val enc = Similarity.encodePq(celled, "embedding", "pq", cbs)
    val path = java.nio.file.Files.createTempDirectory("pq_idx").toString
    Similarity.writePqIndex(enc, "vec_id", "pq", cbs, path,
      cellCol = Some("cell"))
    val back = Similarity.readPqCodebooks(s, path)
    assert(back == cbs, "codebook sidecar must round-trip exactly")
    val idx = s.read.parquet(path)
    assert(idx.count() == nClusters.toLong * perCluster)
    // codes-only layout: no raw vector column persisted
    assert(!idx.columns.contains("embedding"))
    // cell is a partition column: a one-cell read prunes directories
    val one = idx.filter(col("cell") === 0)
    val scan = one.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") && scan.contains("cell"),
      s"cell filter not pushed to partition pruning:\n$scan")
    // searching from the re-read index + sidecar equals the in-memory
    // search (byte-identical results)
    val queries = celled.filter(col("vec_id") % 1000 < 2)
    val fromIdx = Similarity.pqTopK(
      idx.join(celled.select("vec_id", "embedding"), "vec_id"),
      queries, "vec_id", "embedding", "pq", back, k = 3,
      cellCol = Some("cell"))
      .collect().map(_.toSeq).sortBy(_.toString)
    val inMem = Similarity.pqTopK(enc, queries, "vec_id", "embedding",
      "pq", cbs, k = 3, cellCol = Some("cell"))
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(fromIdx.toSeq == inMem.toSeq)
  }

  test("deterministic seed codebooks undershoot fails fast") {
    val s = spark
    import s.implicits._
    val tiny = (0L until 3L)
      .map(i => (i, Seq.fill(8)(i.toFloat))).toDF("vec_id", "embedding")
    intercept[IllegalArgumentException](
      Similarity.trainPqSeeds(tiny, "vec_id", "embedding", m = 2, codes = 8))
    intercept[IllegalArgumentException]( // dim 8 not divisible by m=3
      Similarity.trainPqSeeds(tiny, "vec_id", "embedding", m = 3, codes = 2))
  }

  test("encodePqFast is row-for-row identical to the declarative encoder, exact ties included") {
    val s = spark
    import s.implicits._
    // 300 vectors over dim 8; seed codebooks from the 4 smallest-id
    // rows, with row 1 DUPLICATING row 0 → centroids 0 and 1 are
    // identical in every subspace: an exact distance tie on every
    // encode, which must break to the LOWER code in both encoders
    val vecs = (0 until 300).map { i =>
      val base = if (i == 1) 0 else i
      i.toLong -> (0 until 8).map(d => ((base * 31 + d * 7) % 13).toFloat / 13f)
    }
    val df = vecs.toDF("vec_id", "embedding")
    val cbs = Similarity.trainPqSeeds(df, "vec_id", "embedding",
      m = 2, codes = 4)
    def collectCodes(e: org.apache.spark.sql.DataFrame) =
      e.select("vec_id", "pq").collect()
        .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val slow = collectCodes(Similarity.encodePq(df, "embedding", "pq", cbs))
    val fast = collectCodes(Similarity.encodePqFast(df, "embedding", "pq", cbs))
    assert(slow == fast)
    // the duplicated centroid proves the tie path ran: code 1 ties code
    // 0 exactly everywhere, so it may never win
    assert(!fast.values.exists(_.contains(1)))
    // and some vector actually sits nearest the duplicated centroid
    assert(fast.values.exists(_.contains(0)))
  }

  test("exact re-rank: full-depth shortlist reproduces brute force; " +
    "shallow shortlist only reorders its own candidates") {
    val cbs = Similarity.trainPqCodebooksKMeans(
      clustered, "vec_id", "embedding", m = 4, codes = 16, seed = 5L)
    val enc = Similarity.encodePqFast(clustered, "embedding", "pq", cbs)
    val queries = clustered.filter(col("vec_id") % 1000 < 2)
    def sets(df: org.apache.spark.sql.DataFrame) =
      df.select("qid", "nid").collect()
        .groupBy(_.getLong(0)).map { case (q, rs) =>
          q -> rs.map(_.getLong(1)).toSet
        }
    // cand = whole corpus → the exact pass sees every candidate: the
    // result must be the brute-force top-5 (PQ decided nothing)
    val full = Similarity.pqTopKRerank(enc, clustered, queries,
      "vec_id", "embedding", "pq", cbs, k = 5,
      cand = nClusters * perCluster)
    val brute = Similarity.bruteForceTopK(clustered, queries,
      "vec_id", "embedding", k = 5)
    assert(sets(full) == sets(brute))
    // shallow shortlist: the refinement may only pick FROM the ADC
    // candidates, k rows per query, ranks 1..k
    val short = Similarity.pqTopK(enc, queries, "vec_id", "embedding",
      "pq", cbs, k = 12)
      .select("qid", "nid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val rr = Similarity.pqTopKRerank(enc, clustered, queries,
      "vec_id", "embedding", "pq", cbs, k = 5, cand = 12)
    val rows = rr.collect()
    assert(rows.length == queries.count() * 5)
    rows.foreach { r =>
      assert(short.contains((r.getLong(0), r.getLong(1))),
        s"rerank invented a candidate outside the shortlist: $r")
      assert(r.getInt(3) >= 1 && r.getInt(3) <= 5)
    }
  }
}
