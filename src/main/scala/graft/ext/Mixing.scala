package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Data-mixing utilities for training-corpus assembly — deterministic
  * stratified sampling and token-budget sequence packing
  * (beyond-reference extensions; BASELINE north star).
  *
  * Determinism matters more than statistical elegance here: a training
  * mix must be reproducible run-to-run and engine-to-engine, so the
  * sampling decision is a pure function of the row's id (a portable
  * md5-derived hash — the same trick [[Dedup.PortableTokenHash]] uses),
  * never `rand()`. That also makes it a narrow map stage: no shuffle,
  * no sort, resumable at any scale.
  */
object Mixing {

  /** portable 60-bit hash of the id rendered as a decimal string —
    * bit-for-bit reproducible in any engine with md5
    */
  def idHash(id: Column): Column =
    conv(substring(md5(id.cast(StringType).cast(BinaryType)), 1, 15), 16, 10)
      .cast(LongType)

  /** Deterministic per-stratum Bernoulli sampling: keep a row iff
    * `idHash(id) mod 10000 < rate(stratum) * 10000`. Strata absent
    * from `rates` default to `defaultRate`. The usual data-mixing
    * move: up/down-weight sources to hit target proportions.
    */
  def sampleStratified(df: DataFrame, idCol: String, strataCol: String,
      rates: Map[String, Double], defaultRate: Double = 1.0): DataFrame = {
    require((rates.values.toSeq :+ defaultRate).forall(r => r >= 0 && r <= 1),
      "rates must be in [0,1]")
    val threshold = rates.foldLeft(lit((defaultRate * 10000).toInt): Column) {
      case (acc, (stratum, r)) =>
        when(col(strataCol) === stratum, (r * 10000).toInt).otherwise(acc)
    }
    df.filter(pmod(idHash(col(idCol)), lit(10000L)) < threshold)
  }

  /** Per-stratum quota cap (domain balancing): keep the top `k` rows of
    * each stratum under a total order — the standard "at most k docs
    * per domain" curation stage.
    *
    * Skew-safe two-phase top-k: a giant stratum (one domain = half the
    * crawl) would funnel through a single window partition, so phase 1
    * ranks per (stratum, input-partition-id) — a salted shuffle that
    * spreads the hot stratum across reducers and bounds survivors at
    * k × partitions — and only then does the per-stratum window run on
    * the pruned remainder. Both phases use the same total order, so
    * the result is exactly the single-window answer.
    */
  def capPerStratum(df: DataFrame, strataCol: String, k: Int,
      orderBy: Seq[Column], rankCol: String = "keep_rank"): DataFrame = {
    require(k > 0, "k must be positive")
    val localW = Window.partitionBy(col(strataCol), spark_partition_id())
      .orderBy(orderBy: _*)
    val globalW = Window.partitionBy(strataCol).orderBy(orderBy: _*)
    df.withColumn("__lr", row_number().over(localW))
      .filter(col("__lr") <= k).drop("__lr")
      .withColumn(rankCol, row_number().over(globalW).cast(LongType))
      .filter(col(rankCol) <= k)
  }

  /** Temperature-balanced source mixing (the multinomial-with-
    * temperature reweighting of multi-source training mixes): stratum
    * weights w_s = count_s^(1/T) normalized to shares p_s, target picks
    * per stratum = p_s × targetFraction × N, acceptance rate =
    * min(1, picks_s / count_s), then the same deterministic id-hash
    * Bernoulli as [[sampleStratified]].
    *
    *   - T = 1: proportional sampling (shares unchanged);
    *   - T → ∞: uniform across sources (small sources upweighted —
    *     the standard low-resource-language / rare-domain boost);
    *   - T < 1: sharpens toward big sources.
    *
    * One count aggregation + one broadcast map filter; rates round to
    * 1e-4 (the id-hash Bernoulli's resolution) so any engine replays
    * the decision bit-for-bit.
    */
  def temperatureSample(df: DataFrame, idCol: String, strataCol: String,
      temperature: Double, targetFraction: Double): DataFrame = {
    require(temperature > 0, "temperature must be positive")
    require(targetFraction > 0 && targetFraction <= 1,
      "targetFraction must be in (0,1]")
    // deterministic stratum order for the weight sum: double addition
    // is non-associative, and the threshold FLOOR must reproduce in the
    // oracle engine — the 1e-9 epsilon absorbs last-ulp differences
    val counts = df.groupBy(strataCol).count().collect()
      .map(r => r.get(0).toString -> r.getLong(1)).sortBy(_._1)
    val total = counts.map(_._2).sum.toDouble
    val weights = counts.map { case (s, c) =>
      s -> math.pow(c.toDouble, 1.0 / temperature)
    }
    val wSum = weights.map(_._2).sum
    val thresholds = counts.zip(weights).map { case ((s, c), (_, w)) =>
      val picks = w / wSum * targetFraction * total
      s -> math.floor(math.min(1.0, picks / c) * 10000 + 1e-9).toLong
    }
    val threshold = thresholds.foldLeft(lit(0L): Column) {
      case (acc, (s, t)) => when(col(strataCol) === s, lit(t)).otherwise(acc)
    }
    df.filter(pmod(idHash(col(idCol)), lit(10000L)) < threshold)
  }

  /** Epoch-weight UPSAMPLING — the complement of [[temperatureSample]]'s
    * downsampling: training mixes REPEAT under-represented sources
    * (fractional epochs, e.g. a high-quality source at 2.5×). Each row
    * emits `floor(f)` copies plus one more iff the id-hash Bernoulli
    * accepts the fractional remainder — deterministic and
    * engine-replayable like every mixing decision here, and a narrow
    * map stage (explode of a per-row range; no shuffle). Output carries
    * an `epoch` column (0-based copy index) so downstream packing can
    * interleave copies. `f < 1` degenerates to Bernoulli downsampling
    * (≡ [[sampleStratified]] at rate f). Strata absent from `factors`
    * use `defaultFactor`.
    */
  def repeatSample(df: DataFrame, idCol: String, strataCol: String,
      factors: Map[String, Double], defaultFactor: Double = 1.0): DataFrame = {
    require((factors.values.toSeq :+ defaultFactor).forall(_ >= 0),
      "factors must be >= 0")
    def copiesFor(f: Double): Column = {
      val base = math.floor(f).toLong
      // the same 1e-4 Bernoulli grid + FLOOR epsilon as the samplers
      val frac = math.floor((f - base) * 10000 + 1e-9).toLong
      lit(base) +
        when(pmod(idHash(col(idCol)), lit(10000L)) < frac, 1L).otherwise(0L)
    }
    val copies = factors.foldLeft(copiesFor(defaultFactor)) {
      case (acc, (s, f)) => when(col(strataCol) === s, copiesFor(f)).otherwise(acc)
    }
    df.withColumn("__n", copies)
      .filter(col("__n") > 0) // sequence(0, -1) would count DOWN
      .withColumn("epoch", explode(sequence(lit(0L), col("__n") - 1)))
      .drop("__n")
  }

  /** Efraimidis–Spirakis weighted sampling WITHOUT replacement: draw
    * exactly `k` rows where a row's inclusion probability is
    * proportional to `weightCol` (quality-weighted corpus selection,
    * token-share-preserving downsampling). Each row gets the key
    * `u^(1/w)` with `u = (idHash+1)/2⁶⁰` — computed as
    * `ln(u)/w` (same ordering, numerically stable) — and the top-k by
    * key IS an exact E–S sample (VLDB'06 Weighted Random Sampling).
    * Deterministic like every mixing decision here: `u` is the
    * portable md5 id hash, never `rand()`, so any engine replays the
    * exact sample. Rows with weight ≤ 0 are excluded (their E–S
    * inclusion probability is 0).
    *
    * Scale shape: the key is a narrow map stage; top-k plans as
    * `TakeOrderedAndProject` (per-partition heaps, driver merges
    * k·partitions rows) — no global sort, no single-partition
    * exchange. Engine-replay caveat: the key uses `ln`, so an oracle
    * engine's libm must agree to ~1 ulp — divergence requires two keys
    * within one ulp EXACTLY at the rank-k boundary (~2⁻⁵² odds per
    * boundary), far below the banding-miss odds the dedup oracles
    * already accept.
    */
  def weightedSample(df: DataFrame, idCol: String, weightCol: Column,
      k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    df.filter(weightPositive(weightCol))
      .withColumn("__wk", esKey(col(idCol), weightCol))
      .orderBy(col("__wk").desc, col(idCol))
      .limit(k)
      .drop("__wk")
  }

  /** `w > 0` with the explicit NaN drop (Spark orders NaN ABOVE every
    * value, so a bare `> 0` would ADMIT a NaN weight — whose NaN key
    * then sorts first here and last in an external engine; the
    * [[SemanticDedup]] `!isnan`-at-every-threshold-site rule)
    */
  private def weightPositive(w: Column): Column = {
    val d = w.cast(DoubleType)
    d > 0 && !isnan(d)
  }

  /** Per-stratum [[weightedSample]]: exactly `k` rows per stratum,
    * inclusion probability ∝ weight within the stratum — "the best 10k
    * docs per domain, quality-weighted but not deterministic-top-k"
    * (pure top-k by score collapses to one template cluster; weighted
    * sampling keeps diversity while still favoring quality). Runs on
    * [[capPerStratum]]'s skew-safe two-phase top-k, so one giant
    * stratum never funnels through a single window partition.
    */
  def weightedSamplePerStratum(df: DataFrame, idCol: String,
      strataCol: String, weightCol: Column, k: Int): DataFrame =
    capPerStratum(
      df.filter(weightPositive(weightCol))
        .withColumn("__wk", esKey(col(idCol), weightCol)),
      strataCol, k, Seq(col("__wk").desc, col(idCol)))
      .drop("__wk")

  /** the E–S key ln(u)/w with u = (idHash+1)/2⁶⁰ ∈ (0, 1] */
  private def esKey(id: Column, weight: Column): Column =
    log((idHash(id).cast(DoubleType) + 1.0) / math.pow(2.0, 60)) /
      weight.cast(DoubleType)

  /** Token-budget sequence packing (context-window assembly): within
    * each stratum, docs in id order are laid head-to-tail and cut into
    * bins of ~`budgetTokens` — bin = ⌊exclusive-running-token-sum /
    * budget⌋. A doc lands in the bin where its first token falls
    * (bins can overrun by less than one doc — the standard greedy
    * concat-then-chunk packing, not bin-packing).
    *
    * Scale shape: one shuffle on the stratum key; the running sum is a
    * linear per-partition pass. Packing is per-stratum BY DESIGN — a
    * single global ordering would serialize the corpus through one
    * partition; shard first (here: by source) like any 100 TB layout.
    */
  def packSequences(df: DataFrame, idCol: String, strataCol: String,
      tokensCol: Column, budgetTokens: Long): DataFrame = {
    require(budgetTokens > 0, "budgetTokens must be positive")
    val w = Window.partitionBy(strataCol).orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__tok", tokensCol.cast(LongType))
      .withColumn("__cum", sum(col("__tok")).over(w) - col("__tok"))
      .withColumn("bin", (col("__cum") / budgetTokens).cast(LongType))
      .drop("__cum")
      .withColumnRenamed("__tok", "n_tokens")
  }

  /** Per-stratum TOKEN-budget selection ("2 B tokens of src0, 500 M of
    * src1"): within each stratum, docs are taken in deterministic
    * portable-hash order until the budget fills — a doc is kept iff
    * the EXCLUSIVE running token sum before it is under the stratum's
    * budget (so the budget can overrun by less than one doc — the
    * greedy prefix convention [[packSequences]] also uses). Mixture
    * recipes quote token counts, not doc counts; [[sampleStratified]]'s
    * doc-rate knob can't hit a token target when doc lengths differ
    * across sources.
    *
    * Scale shape: the hash-order prefix sum is computed BUCKETED, not
    * through one per-stratum window task: docs land in `buckets`
    * hash-RANGE buckets (bucket = high bits of the order hash, so
    * bucket order IS hash order), per-bucket token sums aggregate
    * map-combined (strata×buckets tiny rows), the exclusive
    * cross-bucket offsets are a window over that tiny aggregate, and
    * each doc's prefix = its bucket's offset + a within-bucket running
    * sum (window partitioned by stratum AND bucket — `buckets`× the
    * parallelism of the naive per-stratum window, same answer because
    * addition is associative and the (hash, id) order is identical).
    */
  def tokenBudgetCap(df: DataFrame, idCol: String, strataCol: String,
      tokensCol: Column, budgetTokens: Map[String, Long],
      defaultBudget: Long, buckets: Int = 64): DataFrame = {
    require(buckets >= 1, "buckets must be positive")
    require((defaultBudget +: budgetTokens.values.toSeq).forall(_ >= 0),
      "budgets must be non-negative")
    val budget = budgetTokens.foldLeft(lit(defaultBudget)) {
      case (acc, (k, v)) => when(col(strataCol) === k, lit(v)).otherwise(acc)
    }
    // idHash is 60-bit; the top bits pick the bucket so bucket index
    // is monotone in the hash — the concatenated bucket order equals
    // plain hash order
    val shift = 60 - (63 - java.lang.Long.numberOfLeadingZeros(buckets.toLong))
    val keyed = df
      .withColumn("__h", idHash(col(idCol)))
      .withColumn("__b", shiftright(col("__h"), shift))
      .withColumn("__tok", tokensCol.cast(LongType))
    // fresh aliases (__s/__ob) — the aggregate reuses keyed's attribute
    // ids, and a join condition on the same attribute id is a self-
    // comparison, not a key match
    val bucketSums = keyed.groupBy(col(strataCol).as("__s"), col("__b").as("__ob"))
      .agg(sum(col("__tok")).as("__bsum"))
    val off = Window.partitionBy("__s").orderBy("__ob")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = bucketSums
      .withColumn("__off", coalesce(sum(col("__bsum")).over(off), lit(0L)))
      .select(col("__s"), col("__ob"), col("__off"))
    val local = Window.partitionBy(col(strataCol), col("__b"))
      .orderBy(col("__h"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    keyed
      .join(broadcast(offsets),
        keyed(strataCol) === offsets("__s") && keyed("__b") === offsets("__ob"))
      .withColumn("__cum",
        col("__off") + coalesce(sum(col("__tok")).over(local), lit(0L)))
      .filter(col("__cum") < budget)
      .drop("__h", "__b", "__s", "__ob", "__tok", "__off", "__cum")
  }

  /** Deterministic global training-order shuffle + sharding: order key
    * = portable hash of (seed, id); `shard` = key mod `shards`; `pos`
    * = rank within the shard by (key, id). The canonical
    * write-the-training-corpus-in-random-order layout: one hash
    * exchange on the shard key + a per-shard sort, reproducible
    * run-to-run and engine-to-engine (no `rand()`). At production
    * scale `shards` is sized to the cluster (thousands), so no window
    * ever concentrates on a single task — there is deliberately NO
    * global ORDER BY anywhere in this shape.
    */
  def shardAssign(df: DataFrame, idCol: String, shards: Int,
      seed: String = "shuf"): DataFrame = {
    require(shards >= 1, "shards must be >= 1")
    val key = conv(substring(
      md5(concat(lit(s"$seed:"), col(idCol).cast(StringType))), 1, 15),
      16, 10).cast(LongType)
    df.withColumn("__k", key)
      .withColumn("shard", (col("__k") % shards).cast(IntegerType))
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("shard")).orderBy(col("__k"), col(idCol))))
      .drop("__k")
  }

  /** Deterministic negative sampling for contrastive training: each
    * anchor gets `k` random negatives drawn from the corpus id space
    * `[0, n)` by a portable pair hash — candidates equal to the anchor
    * or sharing its group (cluster / label / dup-component) are
    * rejected, surviving draws keep their draw order, duplicates keep
    * the first draw. No `rand()` anywhere: the pair (anchor, j) fully
    * determines the candidate, so the sample is stable run-to-run and
    * replayable by any engine with md5.
    *
    * Shape: anchors × draws is the SMALL side (explode + broadcast);
    * the corpus contributes one hash-join probe per candidate id. The
    * per-anchor windows run over ≤ `draws` rows.
    */
  def negativeSample(anchors: DataFrame, corpus: DataFrame,
      idCol: String, grpCol: String, n: Long, k: Int,
      draws: Int = 64): DataFrame = {
    require(n > 0 && k >= 1 && draws >= k)
    val a = anchors
      .select(col(idCol).cast(LongType).as("qid"), col(grpCol).as("__qg"))
      .withColumn("__j", explode(sequence(lit(0), lit(draws - 1))))
      .withColumn("__cand", pmod(
        conv(substring(md5(concat(col("qid").cast(StringType), lit(":"),
          col("__j").cast(StringType))), 1, 15), 16, 10).cast(LongType),
        lit(n)))
    val lab = corpus
      .select(col(idCol).cast(LongType).as("__cand"), col(grpCol).as("__cg"))
    lab.join(broadcast(a), "__cand")
      .filter(col("__cand") =!= col("qid") && col("__cg") =!= col("__qg"))
      .withColumn("__d", row_number().over(
        Window.partitionBy("qid", "__cand").orderBy("__j")))
      .filter(col("__d") === 1)
      .withColumn("rn", row_number().over(
        Window.partitionBy("qid").orderBy("__j")))
      .filter(col("rn") <= k)
      .select(col("qid"), col("__cand").as("neg_id"), col("rn"))
  }

  /** Cluster-balanced diversity sampling (the selection face of
    * SemDeDup-style curation): coarse-quantize the corpus into `k`
    * embedding cells and keep at most `perCell` rows per cell — dense
    * regions (boilerplate, template families, over-represented topics)
    * are capped while sparse regions keep everything, flattening the
    * semantic density of the mix. Returns (`idCol`, cell, keep_rank)
    * for the kept rows.
    *
    * Scale shape: cell assignment is the broadcast-literal argmax
    * ([[Similarity.assignCells]] — one codegen map pass, no shuffle);
    * the per-cell cap is [[capPerStratum]]'s salted two-phase window
    * (local prune to ≤ perCell × partitions survivors, then the exact
    * per-cell rank on the residual) — a hot cell never concentrates on
    * one task. The default quantizer is the deterministic
    * [[Similarity.trainCentroids]] (oracle-replayable); production
    * passes k-means‖ centroids and every downstream shape is unchanged.
    */
  def clusterBalancedSample(df: DataFrame, idCol: String, vecCol: String,
      k: Int, perCell: Int,
      centroids: Option[Seq[(Int, Seq[Float])]] = None): DataFrame = {
    val cents = centroids.getOrElse(
      Similarity.trainCentroids(df, idCol, vecCol, k))
    val celled = Similarity.assignCells(
      df.select(col(idCol), col(vecCol)), vecCol, "cell", cents)
    capPerStratum(celled.select(col(idCol), col("cell")), "cell", perCell,
      Seq(col(idCol)))
  }
}
