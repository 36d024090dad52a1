package graft.tools

import graft.ext.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PQ/ADC scale stress: does the ADC search shape hold when the corpus
  * is ~500× the oracle table?
  *
  * Synthesizes an N×dim clustered corpus distributedly (deterministic
  * xxhash64 noise around `cells` cluster directions — no driver-side
  * data) and PLANTS the ground truth: each of the Q query vectors gets
  * exactly `k` planted near-neighbors (its own vector + 1% noise,
  * cosine ≈ 0.9999) against a within-cluster crowd at cosine ≈ 0.94 —
  * so exact top-k ≡ the planted set and recall is well-defined. (A
  * first cut measured recall among ~31k near-tied clustermates, where
  * top-10 is arbitrary — planted neighbors fix the experiment, and that
  * run also exposed the HOF-shaped encode/ADC hot paths this tool now
  * regression-gates: see encodePqFast / the unrolled LUT sum.)
  *
  * Three search paths, same queries:
  *   - exact brute-force cosine (baseline): dim·4 bytes + dim mults per
  *     (query, row);
  *   - full-scan ADC over PQ codes: m ints + m LUT adds per pair — the
  *     100 TB argument is byte-bound, not flop-bound;
  *   - IVF-PQ: coarse-cell pruning × ADC — candidates shrink ~cells×.
  *
  * Index-build costs (encode, coarse assign) are timed separately from
  * search — one-off corpus passes, amortized across queries.
  *
  * Usage: runMain graft.tools.StressPq [n] [dim] [cells] [queries]
  */
object StressPq {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toInt else 2000000
    val dim = if (args.length > 1) args(1).toInt else 64
    val cells = if (args.length > 2) args(2).toInt else 64
    val nq = if (args.length > 3) args(3).toInt else 100
    val k = 10
    val m = 8
    val codes = 256

    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def unit(h: org.apache.spark.sql.Column) =
      (pmod(h, lit(2000001L)) - lit(1000000L)).cast("double") / 1e6
    def baseVec(id: org.apache.spark.sql.Column) =
      transform(sequence(lit(0), lit(dim - 1)), d =>
        (unit(xxhash64(id % cells, d, lit(1))) +
          unit(xxhash64(id, d, lit(2))) * 0.25).cast("float"))

    // ids: [0, nq) queries, [nq, nq + nq·k) planted neighbors,
    // [nq + nq·k, n) crowd
    val queries = spark.range(nq)
      .select(col("id").as("vec_id"), baseVec(col("id")).as("embedding"))
      .localCheckpoint(true)
    val planted = queries
      .select(col("vec_id").as("qid"), col("embedding"),
        explode(sequence(lit(0), lit(k - 1))).as("rep"))
      .select((lit(nq) + col("qid") * k + col("rep")).as("vec_id"),
        transform(col("embedding"), (x, d) =>
          (x + unit(xxhash64(col("qid") * k + col("rep"), d, lit(3)))
            * 0.01).cast("float")).as("embedding"))
    val crowd = spark.range(nq.toLong * (k + 1), n)
      .select(col("id").as("vec_id"), baseVec(col("id")).as("embedding"))
    val staged = queries.union(planted).union(crowd).localCheckpoint(true)

    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    def materialize(df: DataFrame): DataFrame = {
      val out = df.localCheckpoint(eager = true)
      out.count()
      out
    }
    // recall vs the PLANTED ground truth: hit = neighbor is one of its
    // query's k planted ids
    def recall(res: DataFrame): Double =
      res.filter(col("nid") >= nq && col("nid") < nq.toLong * (k + 1) &&
        // floor, because Column./ on integers is FLOAT division
        floor((col("nid") - nq) / k) === col("qid")).count()
        .toDouble / (nq.toLong * k)

    // 1. exact baseline — must recover the planted set (sanity gate)
    val (exact, tExact) = time(materialize(
      Similarity.bruteForceTopK(staged, queries, "vec_id", "embedding", k)))
    val rExact = recall(exact)
    if (sys.env.contains("SPARK_GRAFT_STRESS_DEBUG")) {
      exact.filter(col("qid") === 0).orderBy("rn").show(12, false)
      staged.filter(col("vec_id") < nq + 2L * k).orderBy("vec_id")
        .select(col("vec_id"), slice(col("embedding"), 1, 4).as("head4"))
        .show(2 * k + nq.min(5), false)
    }

    // 2. PQ: bounded-sample training + one-off fast encode, ADC scan
    val (cbs, tTrain) = time(Similarity.trainPqCodebooksKMeans(
      staged, "vec_id", "embedding", m = m, codes = codes))
    val (encoded, tEncode) = time(materialize(
      Similarity.encodePqFast(staged, "embedding", "pq", cbs)
        .select("vec_id", "pq")))
    val (adc, tAdc) = time(materialize(Similarity.pqTopK(
      encoded, queries, "vec_id", "embedding", "pq", cbs, k)))

    // 3. IVF-PQ: coarse quantizer + cell assignment (build), then
    // cell-restricted ADC (search)
    val (cents, tCoarse) = time(Similarity.trainCentroidsKMeansPP(
      staged, "vec_id", "embedding", k = cells))
    val (assigned, tAssign) = time(materialize(
      Similarity.assignCells(staged, "embedding", "cell", cents)
        .select("vec_id", "cell")))
    val encodedCells = materialize(encoded.join(assigned, "vec_id"))
    val queriesCells = Similarity.assignCells(
      queries, "embedding", "cell", cents)
    val (ivfpq, tIvfPq) = time(materialize(Similarity.pqTopK(
      encodedCells, queriesCells, "vec_id", "embedding", "pq", cbs, k,
      cellCol = Some("cell"))))

    val rAdc = recall(adc)
    val rIvf = recall(ivfpq)

    println(f"""{"n":$n,"dim":$dim,"cells":$cells,"queries":$nq,"k":$k,"m":$m,"codes":$codes,""" +
      f""""exact_sec":$tExact%.2f,"exact_recall":$rExact%.3f,""" +
      f""""pq_train_sec":$tTrain%.2f,"pq_encode_sec":$tEncode%.2f,""" +
      f""""adc_sec":$tAdc%.2f,"adc_recall":$rAdc%.3f,""" +
      f""""coarse_train_sec":$tCoarse%.2f,"assign_sec":$tAssign%.2f,""" +
      f""""ivfpq_sec":$tIvfPq%.2f,"ivfpq_recall":$rIvf%.3f}""")

    // the scale claims this stress exists to check
    assert(rExact >= 0.95,
      f"exact recall $rExact%.3f < 0.95 — planted ground truth broken")
    assert(rAdc >= 0.6, f"ADC recall@10 $rAdc%.3f < 0.6 on planted neighbors")
    assert(rIvf >= 0.5, f"IVF-PQ recall@10 $rIvf%.3f < 0.5 on planted neighbors")
    assert(tEncode < tExact * 5,
      f"PQ encode ($tEncode%.1fs) is a one-off corpus pass and must stay " +
        f"within ~5x one exact scan ($tExact%.1fs) — HOF regression?")
    // ADC's 100 TB advantage is BYTES SCANNED (m ints vs dim·4 floats a
    // row) — invisible at local scale where the corpus sits in page
    // cache, so full-scan ADC only has to stay the same order as the
    // exact scan here (measured 1.1–1.5× across runs; both are
    // dominated by the same 200M-row join + top-k machinery). The
    // latency win that must show locally is IVF-PQ's candidate pruning.
    assert(tAdc < tExact * 2,
      f"full-scan ADC ($tAdc%.1fs) must stay the same order as the exact scan ($tExact%.1fs)")
    assert(tIvfPq < tExact,
      f"IVF-PQ search ($tIvfPq%.1fs) must beat the exact scan ($tExact%.1fs)")
    spark.stop()
  }
}
