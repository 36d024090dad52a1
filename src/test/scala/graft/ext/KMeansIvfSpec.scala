package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Sampled k-means++ quantizer + multi-probe IVF: on clusterable data
  * the trained cells align with the true clusters, single-probe recall
  * is high, and training is deterministic per seed. (On isotropic
  * random vectors — like the driver's synthetic embeddings table — NO
  * quantizer can beat the candidate fraction; `tools.IvfCheck` records
  * that measurement, PLANS.md discusses it.)
  */
object KMeansIvfSpec {
  /** serializable normalizer for executor-side fixture generation (a
    * local def inside a test method would drag the suite into the
    * closure)
    */
  private[ext] def unitV(v: Array[Double]): Array[Double] = {
    val n = math.sqrt(v.map(x => x * x).sum)
    if (n == 0) v else v.map(_ / n)
  }
}

class KMeansIvfSpec extends SparkSpec {
  import KMeansIvfSpec.unitV

  private val dim = 32
  private val nClusters = 8
  private val perCluster = 60

  /** deterministic clustered corpus: tight gaussian balls around
    * orthogonal-ish random centers
    */
  private lazy val clustered = {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(7L)
    def unit(v: Array[Double]) = {
      val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n)
    }
    val centers = Array.fill(nClusters)(
      unit(Array.fill(dim)(rng.nextGaussian())))
    (0 until nClusters).flatMap { c =>
      (0 until perCluster).map { j =>
        val p = unit(centers(c).map(_ + 0.15 * rng.nextGaussian()))
        (c.toLong * 1000 + j, p.map(_.toFloat).toSeq, c)
      }
    }.toDF("vec_id", "embedding", "true_cluster")
  }

  test("k-means++ training is deterministic and balances cells") {
    val a = Similarity.trainCentroidsKMeansPP(
      clustered, "vec_id", "embedding", nClusters, seed = 11L)
    val b = Similarity.trainCentroidsKMeansPP(
      clustered, "vec_id", "embedding", nClusters, seed = 11L)
    assert(a == b, "same seed must reproduce the same centroids")
    val sizes = Similarity.assignCells(clustered, "embedding", "cell", a)
      .groupBy("cell").count().collect().map(_.getLong(1))
    assert(sizes.length == nClusters)
    // clusterable data: every trained cell lands near one true cluster
    assert(sizes.min >= perCluster / 2,
      s"cell sizes ${sizes.sorted.mkString(",")} — quantizer collapsed")
  }

  test("trained cells align with the true clusters") {
    val cents = Similarity.trainCentroidsKMeansPP(
      clustered, "vec_id", "embedding", nClusters, seed = 11L)
    val celled = Similarity.assignCells(clustered, "embedding", "cell", cents)
    // dominant true_cluster per cell covers ~all of the cell
    val purity = celled.groupBy("cell", "true_cluster").count()
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("cell").orderBy(col("count").desc)))
      .filter(col("rk") === 1)
      .agg(sum("count")).head().getLong(0).toDouble /
      (nClusters * perCluster)
    assert(purity >= 0.95, s"cell purity $purity")
  }

  test("single-probe IVF recall@10 >= 0.9 on clusterable data") {
    val cents = Similarity.trainCentroidsKMeansPP(
      clustered, "vec_id", "embedding", nClusters, seed = 11L)
    val celled = Similarity.assignCells(clustered, "embedding", "cell", cents)
      .cache()
    val queries = celled.orderBy("vec_id").limit(25).cache()
    def rs(df: org.apache.spark.sql.DataFrame) = df.select("qid", "nid")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val truth = rs(Similarity.bruteForceTopK(
      celled, queries, "vec_id", "embedding", 10))
    val single = rs(Similarity.ivfTopK(
      celled, queries, "vec_id", "embedding", "cell", 10))
    val recall1 = (truth & single).size.toDouble / truth.size
    assert(recall1 >= 0.9, s"single-probe recall $recall1")
    // multi-probe dominates single-probe
    val multi = rs(Similarity.ivfTopKProbe(
      celled, queries, "vec_id", "embedding", "cell", 10, cents, 2))
    val recall2 = (truth & multi).size.toDouble / truth.size
    assert(recall2 >= recall1)
  }

  test("self-contained IVF index: raw queries search via the persisted quantizer") {
    val cents = Similarity.trainCentroidsKMeansPP(
      clustered, "vec_id", "embedding", nClusters, seed = 11L)
    val dir = java.nio.file.Files.createTempDirectory("ivf-idx").toString
    Similarity.buildIvfIndex(clustered, "vec_id", "embedding", cents, dir)
    // quantizer round-trips exactly
    assert(Similarity.readCentroids(spark, dir) == cents)
    // raw (un-celled) queries search the index; result equals the
    // in-memory celled path
    val queries = clustered.select("vec_id", "embedding")
      .orderBy("vec_id").limit(20).cache()
    def rs(df: org.apache.spark.sql.DataFrame) = df.select("qid", "nid")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val fromIndex = rs(Similarity.ivfSearchIndexed(spark, dir, queries,
      "vec_id", "embedding", k = 10, nprobe = 2))
    val celled = Similarity.assignCells(clustered, "embedding", "cell", cents)
    val inMemory = rs(Similarity.ivfTopKProbe(celled, queries,
      "vec_id", "embedding", "cell", 10, cents, 2))
    assert(fromIndex == inMemory)
  }

  test("k-means|| matches the sampled trainer's quality at small k and " +
    "is deterministic per seed") {
    // small k → few candidates (≈ rounds·2k): the distributed Lloyd
    // refinement is what polishes the sketch-reduced centroids onto the
    // true cluster means (and this exercises that code path)
    // small k needs a denser sketch (rounds·oversample·k candidates out
    // of 480 rows) for the reduction to see every cluster; the
    // distributed Lloyd refinement then polishes onto the cluster means
    // (and exercises that code path)
    def train() = Similarity.trainCentroidsKMeansParallel(
      clustered, "vec_id", "embedding", nClusters,
      rounds = 5, oversample = 4.0, lloydIters = 2, seed = 11L)
    val a = train()
    val b = train()
    assert(a == b, "same seed must reproduce the same centroids")
    val celled = Similarity.assignCells(clustered, "embedding", "cell", a)
    val purity = celled.groupBy("cell", "true_cluster").count()
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("cell").orderBy(col("count").desc)))
      .filter(col("rk") === 1)
      .agg(sum("count")).head().getLong(0).toDouble /
      (nClusters * perCluster)
    assert(purity >= 0.95, s"cell purity $purity")
  }

  /** The large-k case the sampled trainer cannot touch (its 4096-row
    * driver sample cannot seed k ≫ sample): k = 1024 over a ~100k-row
    * clustered corpus. Driver work stays bounded by the candidate
    * sketch, never the corpus.
    */
  test("k-means|| trains k=1024 over a 100k clustered corpus") {
    val s = spark
    import s.implicits._
    val bigK = 1024
    val per = 97
    val bigDim = 8
    val rng = new scala.util.Random(13L)
    def unit(v: Array[Double]) = {
      val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n)
    }
    // centers on the driver (k x dim, small), ROWS generated on the
    // executors from a per-row seeded rng: a driver-built Seq.toDF of
    // ~100k vectors ships the whole corpus inside stage-0 task
    // closures (the 2362 KiB "task of very large size" WARN this spec
    // used to carry — fixture noise masquerading as a trainer problem)
    val centers = Array.fill(bigK)(unit(Array.fill(bigDim)(rng.nextGaussian())))
    val cbc = spark.sparkContext.broadcast(centers)
    val big = spark.range(bigK.toLong * per)
      .as[Long]
      .map { i =>
        val c = (i / per).toInt
        val r = new scala.util.Random(13L ^ (i * 0x9E3779B97F4A7C15L))
        val p = unitV(cbc.value(c).map(_ + 0.02 * r.nextGaussian()))
        (c.toLong * 1000 + (i % per), p.map(_.toFloat).toSeq, c)
      }.toDF("vec_id", "embedding", "true_cluster")
      .repartition(32).cache()
    assert(big.count() == bigK.toLong * per)

    // sampled trainer fails fast: 4096-row sample < k — the ceiling
    intercept[IllegalArgumentException] {
      Similarity.trainCentroidsKMeansPP(big, "vec_id", "embedding", 4097)
    }

    val cents = Similarity.trainCentroidsKMeansParallel(
      big, "vec_id", "embedding", bigK,
      rounds = 2, oversample = 1.25, seed = 17L)
    assert(cents.size == bigK)
    val celled = Similarity.assignCells(big, "embedding", "cell", cents)
      .cache()
    val nonEmpty = celled.select("cell").distinct().count()
    assert(nonEmpty >= bigK * 85 / 100,
      s"only $nonEmpty of $bigK cells populated — quantizer collapsed")
    // purity: rows landing in their cell's dominant true cluster
    val purity = celled.groupBy("cell", "true_cluster").count()
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("cell").orderBy(col("count").desc)))
      .filter(col("rk") === 1)
      .agg(sum("count")).head().getLong(0).toDouble / (bigK.toLong * per)
    assert(purity >= 0.85, s"cell purity $purity at k=$bigK")
  }

  /** The distributed large-k regime (l > 2048 draws/round): candidates
    * stay in staged DataFrames, the coreset reduction shrinks the
    * sketch distributedly, and the driver holds only the reduced reps +
    * the k×dim result — the r6 verdict's named next step past the
    * 65k-cell sketch ceiling. Same purity gates as the literal regime.
    */
  test("k-means|| trains k=8192 via the distributed sketch path") {
    val s = spark
    import s.implicits._
    val bigK = 8192
    val per = 6
    val bigDim = 16
    val rng = new scala.util.Random(29L)
    def unit(v: Array[Double]) = {
      val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n)
    }
    // executor-side row generation, same reason as the k=1024 fixture
    // (the old driver-built Seq rode in stage-0 tasks: 1557 KiB WARN)
    val centers = Array.fill(bigK)(unit(Array.fill(bigDim)(rng.nextGaussian())))
    val cbc = spark.sparkContext.broadcast(centers)
    val big = spark.range(bigK.toLong * per)
      .as[Long]
      .map { i =>
        val c = (i / per).toInt
        val r = new scala.util.Random(29L ^ (i * 0x9E3779B97F4A7C15L))
        val p = unitV(cbc.value(c).map(_ + 0.02 * r.nextGaussian()))
        (c.toLong * 1000 + (i % per), p.map(_.toFloat).toSeq, c)
      }.toDF("vec_id", "embedding", "true_cluster")
      .repartition(32).cache()
    assert(big.count() == bigK.toLong * per)

    val cents = Similarity.trainCentroidsKMeansParallel(
      big, "vec_id", "embedding", bigK,
      rounds = 2, oversample = 1.25, seed = 23L)
    assert(cents.size == bigK)
    val celled = Similarity.assignCells(big, "embedding", "cell", cents)
      .cache()
    val nonEmpty = celled.select("cell").distinct().count()
    assert(nonEmpty >= bigK * 85 / 100,
      s"only $nonEmpty of $bigK cells populated — quantizer collapsed")
    val purity = celled.groupBy("cell", "true_cluster").count()
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("cell").orderBy(col("count").desc)))
      .filter(col("rk") === 1)
      .agg(sum("count")).head().getLong(0).toDouble / (bigK.toLong * per)
    assert(purity >= 0.85, s"cell purity $purity at k=$bigK")
  }

  test("broadcast argmax (k > LiteralCentroidLimit) assigns the same " +
    "cells as the literal fold — random vectors, exact ties, zero " +
    "vectors") {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(13L)
    val dim = 8
    // centroids: k just over the literal limit, with a crafted EXACT
    // duplicate pair (ids 7 and 290 share a vector — the lexicographic
    // (cs, cell) tie rule must pick 290) and one centroid at a vector
    // a corpus row duplicates (cs exactly 1.0 after rounding)
    val dupVec = Seq.fill(dim)(rng.nextGaussian().toFloat)
    val k = Similarity.LiteralCentroidLimit + 44
    val cents: Seq[(Int, Seq[Float])] = (0 until k).map { i =>
      if (i == 7 || i == k - 10) (i, dupVec)
      else (i, Seq.fill(dim)(rng.nextGaussian().toFloat))
    }
    val corpus = ((0 until 400).map(i =>
      (i.toLong, Seq.fill(dim)(rng.nextGaussian().toFloat))) ++
      Seq((9001L, dupVec), // exact centroid hit -> the duplicate pair tie
        (9002L, Seq.fill(dim)(0f)), // zero vector -> NaN cosine path
        (9003L, null.asInstanceOf[Seq[Float]]))) // NULL vector -> NULL cell
      .toDF("vec_id", "embedding")

    // literal reference: the same guarded fold assignCells uses below
    // the limit, built here directly so both paths run at the SAME k
    val centArr = array(cents.map { case (i, v) =>
      struct(lit(i).as("cell"), typedlit(v).as("cv"))
    }: _*)
    val scored = transform(centArr, c => struct(
      round(Similarity.cosine(col("embedding"), c.getField("cv")), 9)
        .as("cs"),
      c.getField("cell").as("cell")))
    def cellMap(df: org.apache.spark.sql.DataFrame): Map[Long, Option[Int]] =
      df.select("vec_id", "cell").collect()
        .map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) None else Some(r.getInt(1)))).toMap
    val literal = cellMap(corpus.withColumn("cell",
      when(col("embedding").isNull,
        lit(null).cast(org.apache.spark.sql.types.IntegerType))
        .otherwise(array_max(scored).getField("cell"))))

    assert(k > Similarity.LiteralCentroidLimit)
    val broadcastPath = cellMap(Similarity.assignCells(
      corpus, "embedding", "cell", cents))
    assert(broadcastPath == literal,
      s"diverged: ${(broadcastPath.toSet diff literal.toSet).take(5)}")
    // the tie really exercised the rule: the duplicated centroid pair
    // resolves to the larger id
    assert(literal(9001L) == Some(k - 10), literal(9001L).toString)
    // null vector: NULL cell on BOTH paths — the r10 ADVICE divergence
    // (literal fold fell through to the largest cell id) is pinned shut.
    // The small-k literal path goes through assignCells itself here.
    assert(literal(9003L).isEmpty && broadcastPath(9003L).isEmpty)
    val smallK = cellMap(Similarity.assignCells(
      corpus, "embedding", "cell", cents.take(8)))
    assert(smallK(9003L).isEmpty,
      s"literal assignCells path must yield NULL, got ${smallK(9003L)}")
  }

  test("semanticDedup accepts trained centroids") {
    val s = spark
    import s.implicits._
    // two exact-duplicate pairs injected into the clustered corpus
    val base = clustered.select("vec_id", "embedding")
    val dups = clustered.filter(col("vec_id").isin(1L, 1001L))
      .select((col("vec_id") + 500000L).as("vec_id"), col("embedding"))
    val corpus = base.unionAll(dups)
    val cents = Similarity.trainCentroidsKMeansPP(
      corpus, "vec_id", "embedding", nClusters, seed = 11L)
    val verdicts = SemanticDedup.semanticDedup(
      corpus, "vec_id", "embedding", nClusters, tau = 0.999,
      centroids = Some(cents))
    val dropped = verdicts.filter(!col("keep"))
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(dropped == Set(500001L, 501001L),
      s"expected the injected duplicates to drop, got $dropped")
  }
}
