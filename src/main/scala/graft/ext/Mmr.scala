package graft.ext

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Maximal-marginal-relevance selection — diversified top-k over an
  * embedding shortlist: greedily pick the candidate maximizing
  * λ·sim(query, c) − (1−λ)·max_{s∈selected} sim(c, s), so the result
  * covers the query's neighborhood instead of returning k near-copies
  * (the retrieval-curation step after any ANN search; beyond-reference
  * extension).
  *
  * Determinism contract: similarities are computed in double precision
  * with SEQUENTIAL per-row summation (order-fixed on every engine),
  * scaled to integer at 10⁻⁹ resolution, and the greedy argmax breaks
  * ties by smallest id — so the selection is integer-exact and an
  * external engine replays it step for step
  * ([[oracleSqlFor]] generates the unrolled DuckDB CTE chain from the
  * same constants).
  *
  * Scale shape: MMR is inherently sequential (each pick conditions the
  * next), so it runs on the DRIVER over a BOUNDED shortlist — the
  * distributed part is whatever produced the shortlist
  * ([[Similarity.bruteForceTopK]] / the IVF family); `maxShortlist`
  * enforces the bound. Cost: O(|shortlist|·k) sequential dot products.
  */
object Mmr {

  private val Scale = 1000000000L // 1e9: sims land on an integer grid

  private def cos(a: Array[Double], b: Array[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  // HALF_UP = half AWAY FROM ZERO — the same tie rule DuckDB's
  // ROUND(x*1e9, 0) applies. Math.round would differ on NEGATIVE
  // cosines landing exactly on a .5 grid point (it rounds toward +inf:
  // Math.round(-2.5) = -2, DuckDB ROUND → -3), which could flip a
  // greedy pick in precisely the integer-exact replay this module
  // advertises.
  private[ext] def scaled(x: Double): Long =
    new java.math.BigDecimal(x * Scale)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()

  /** (rank, id, rel) — `rel` is ROUND(cos(query, c), 4), display only;
    * selection uses the 1e-9 integer grid. `candidates` must already
    * be a shortlist (require ≤ `maxShortlist` rows).
    */
  def select(candidates: DataFrame, idCol: String, vecCol: String,
      queryVec: Array[Double], k: Int, lambdaPct: Int = 70,
      maxShortlist: Int = 8192): DataFrame = {
    require(k >= 1, "k must be >= 1")
    require(lambdaPct >= 1 && lambdaPct <= 99, "lambdaPct in [1,99]")
    val spark = candidates.sparkSession
    import spark.implicits._
    val rows: Array[(Long, Array[Double])] = candidates
      .select(col(idCol).cast(LongType),
        col(vecCol).cast(ArrayType(DoubleType)))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    require(rows.length <= maxShortlist,
      s"MMR shortlist has ${rows.length} rows > $maxShortlist — run the " +
        "distributed top-N first and re-rank its output")
    // a zero vector makes cosine NaN, which BigDecimal rejects with an
    // opaque NumberFormatException and DuckDB's list_cosine_similarity
    // is equally undefined on — refuse up front with the id instead
    require(queryVec.exists(_ != 0.0),
      "MMR query embedding is all-zero — cosine similarity is undefined")
    rows.find(!_._2.exists(_ != 0.0)).foreach { case (id, _) =>
      throw new IllegalArgumentException(
        s"MMR candidate id=$id has an all-zero embedding — cosine " +
          "similarity is undefined; filter zero-norm vectors first")
    }
    val byId = rows.sortBy(_._1)
    val rawQ: Map[Long, Double] = byId.map { case (id, v) =>
      id -> cos(queryVec, v)
    }.toMap
    val sq: Map[Long, Long] = rawQ.map { case (id, c) => id -> scaled(c) }
    val vecs = byId.toMap
    val lam = lambdaPct.toLong
    val lam1 = 100L - lambdaPct
    val selected = scala.collection.mutable.ArrayBuffer.empty[Long]
    val remaining = scala.collection.mutable.TreeSet(byId.map(_._1): _*)
    val picks = math.min(k, byId.length)
    for (_ <- 1 to picks) {
      val best =
        if (selected.isEmpty) remaining.maxBy(id => (sq(id), -id))
        else remaining.maxBy { id =>
          val ms = selected.iterator
            .map(s => scaled(cos(vecs(id), vecs(s)))).max
          (lam * sq(id) - lam1 * ms, -id)
        }
      selected += best
      remaining -= best
    }
    selected.zipWithIndex.map { case (id, i) =>
      // HALF_UP on the RAW cosine — the same rounding DuckDB's
      // ROUND(cs, 4) applies (half away from zero)
      (i + 1, id, new java.math.BigDecimal(rawQ(id))
        .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue())
    }.toSeq.toDF("rank", "id", "rel")
  }

  /** [[select]] behind its own distributed shortlist: a top-`shortlistN`
    * cut of `candidates` by (1e-9-grid query similarity DESC, id ASC),
    * then the driver-side greedy re-rank over those rows. This is the
    * scale-safe face — the cut is a TakeOrderedAndProject (heap top-N
    * per partition + driver merge, no global sort, no shuffle), so the
    * collected set is ≤ shortlistN at EVERY corpus size, where calling
    * [[select]] on a raw corpus trips its guard the moment the corpus
    * outgrows `maxShortlist` (exactly what the r13 sf1 leg caught).
    * The grid + id tie-break keep the cut engine-replayable: rank on
    * the same integers the oracle ranks on, never on raw doubles.
    */
  def selectTopN(candidates: DataFrame, idCol: String, vecCol: String,
      queryVec: Array[Double], k: Int, lambdaPct: Int = 70,
      shortlistN: Int = 1024): DataFrame = {
    require(shortlistN >= k, s"shortlistN=$shortlistN < k=$k")
    // collision-proofed internal sort key: a caller-owned column of the
    // same name must survive into the shortlist handed to [[select]],
    // not be silently overwritten and dropped
    val sqCol = "__graft_mmr_sq"
    require(!candidates.columns.contains(sqCol),
      s"selectTopN reserves internal column name '$sqCol'")
    val shortlist = candidates
      // Spark round() is HALF_UP (away from zero), matching DuckDB
      // ROUND and [[scaled]] — all three land on the same integer grid
      .withColumn(sqCol, round(Similarity.cosine(
          col(vecCol), typedLit(queryVec.toSeq)) * Scale.toDouble, 0)
        .cast(LongType))
      .orderBy(col(sqCol).desc, col(idCol).asc)
      .limit(shortlistN)
      .drop(sqCol)
    select(shortlist, idCol, vecCol, queryVec, k, lambdaPct,
      maxShortlist = shortlistN)
  }

  /** the DuckDB replay of [[select]]: `candCte` must define
    * `c(id, v, sq, cs4)` where `v` is DOUBLE[], `sq` the 1e9-scaled
    * BIGINT query similarity and `cs4` its ROUND(·, 4); exposes
    * (rank, id, rel). Unrolled per pick — MMR's sequential greed made
    * explicit as a CTE chain, generated beside the implementation.
    */
  def oracleSqlFor(candCte: String, k: Int, lambdaPct: Int = 70): String = {
    val lam = lambdaPct
    val lam1 = 100 - lambdaPct
    // AS MATERIALIZED: each sel references its predecessor more than
    // once, and DuckDB inlines plain CTEs — an unrolled chain would
    // re-expand the candidate scan exponentially
    val sel1 =
      """sel1 AS MATERIALIZED (SELECT 1 AS rank, id FROM c
        |         ORDER BY sq DESC, id LIMIT 1)""".stripMargin
    val steps = (2 to k).map { t =>
      s"""sc$t AS MATERIALIZED (SELECT c.id,
         |    $lam * c.sq - $lam1 * (
         |      SELECT MAX(CAST(ROUND(list_cosine_similarity(c.v, c2.v)
         |        * 1000000000, 0) AS BIGINT))
         |      FROM c c2 JOIN sel${t - 1} s ON c2.id = s.id) AS score
         |  FROM c WHERE c.id NOT IN (SELECT id FROM sel${t - 1})),
         |sel$t AS MATERIALIZED (SELECT * FROM sel${t - 1}
         |  UNION ALL SELECT $t, id FROM
         |    (SELECT id FROM sc$t ORDER BY score DESC, id LIMIT 1))""".stripMargin
    }
    s"""WITH $candCte,
       |${(sel1 +: steps).mkString(",\n")}
       |SELECT s.rank, s.id, c.cs4 AS rel
       |FROM sel$k s JOIN c ON c.id = s.id ORDER BY s.rank""".stripMargin
  }
}
