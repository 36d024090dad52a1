package graft.tools

import graft.ext.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PQ/ADC scale stress: does the ADC search shape hold when the corpus
  * is ~500× the oracle table?
  *
  * Synthesizes an N×dim clustered corpus distributedly (deterministic
  * xxhash64 noise around `cells` cluster directions — no driver-side
  * data), trains PQ codebooks on a bounded sample, and measures three
  * search paths for the same Q queries:
  *
  *   - exact brute-force cosine (ground truth + baseline): reads
  *     dim·4 bytes/row and does dim mults per (query, row);
  *   - full-scan ADC over PQ codes: reads m ints/row, m LUT adds per
  *     (query, row) — the 100 TB argument is byte-bound, not flop-bound;
  *   - IVF-PQ: coarse-cell pruning × ADC — candidates shrink ~cells×,
  *     bytes per candidate stay m.
  *
  * Index-build costs (encode, coarse assign) are timed separately from
  * search — they are one-off corpus passes, amortized across queries.
  * Reports wall seconds + recall@10 vs exact for both approximate paths.
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

    // clustered corpus: cluster c's center axis d = xxhash64(c, d)
    // mapped to [-1, 1]; a point is its center + 25% deterministic
    // per-point noise. All codegen (sequence/transform) — generation is
    // distributed and reproducible, nothing corpus-sized on the driver.
    def unit(h: org.apache.spark.sql.Column) =
      (pmod(h, lit(2000001L)) - lit(1000000L)).cast("double") / 1e6
    val corpus = spark.range(n).select(
      col("id").as("vec_id"),
      (col("id") % cells).as("truth_cell"),
      transform(sequence(lit(0), lit(dim - 1)), d =>
        (unit(xxhash64(col("id") % cells, d, lit(1))) +
          unit(xxhash64(col("id"), d, lit(2))) * 0.25).cast("float"))
        .as("embedding"))
    val staged = corpus.localCheckpoint(eager = true)
    val queries = staged.filter(col("vec_id") < nq)
      .select("vec_id", "embedding").localCheckpoint(eager = true)

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

    // 1. exact ground truth
    val (exact, tExact) = time(materialize(
      Similarity.bruteForceTopK(staged, queries, "vec_id", "embedding", k)))

    // 2. PQ: bounded-sample training + one-off encode, then ADC scan
    val (cbs, tTrain) = time(Similarity.trainPqCodebooksKMeans(
      staged, "vec_id", "embedding", m = m, codes = codes))
    val (encoded, tEncode) = time(materialize(
      Similarity.encodePq(staged, "embedding", "pq", cbs)
        .select("vec_id", "pq")))
    val (adc, tAdc) = time(materialize(Similarity.pqTopK(
      encoded, queries, "vec_id", "embedding", "pq", cbs, k)))

    // 3. IVF-PQ: coarse quantizer + cell assignment (build), then
    // cell-restricted ADC (search)
    val (cents, tCoarse) = time(Similarity.trainCentroidsKMeansPP(
      staged, "vec_id", "embedding", k = cells))
    val (assigned, tAssign) = time(materialize(
      Similarity.assignCells(staged, "embedding", "cell", cents)))
    val encodedCells = materialize(encoded.join(
      assigned.select("vec_id", "cell"), "vec_id"))
    val queriesCells = Similarity.assignCells(
      queries, "embedding", "cell", cents)
    val (ivfpq, tIvfPq) = time(materialize(Similarity.pqTopK(
      encodedCells, queriesCells, "vec_id", "embedding", "pq", cbs, k,
      cellCol = Some("cell"))))

    def recall(approx: DataFrame): Double = {
      val hits = approx.select(col("qid"), col("nid"))
        .join(exact.select(col("qid"), col("nid")), Seq("qid", "nid"))
        .count()
      hits.toDouble / (nq.toLong * k)
    }
    val rAdc = recall(adc)
    val rIvf = recall(ivfpq)

    println(f"""{"n":$n,"dim":$dim,"cells":$cells,"queries":$nq,"k":$k,"m":$m,"codes":$codes,""" +
      f""""exact_sec":$tExact%.2f,"pq_train_sec":$tTrain%.2f,"pq_encode_sec":$tEncode%.2f,""" +
      f""""adc_sec":$tAdc%.2f,"adc_recall":$rAdc%.3f,""" +
      f""""coarse_train_sec":$tCoarse%.2f,"assign_sec":$tAssign%.2f,""" +
      f""""ivfpq_sec":$tIvfPq%.2f,"ivfpq_recall":$rIvf%.3f}""")

    // the scale claims this stress exists to check
    assert(rAdc >= 0.6, f"ADC recall@10 $rAdc%.3f < 0.6 on clustered data")
    assert(rIvf >= 0.5, f"IVF-PQ recall@10 $rIvf%.3f < 0.5 on clustered data")
    assert(tAdc < tExact * 1.5,
      f"full-scan ADC ($tAdc%.1fs) should not cost more than ~the exact scan ($tExact%.1fs)")
    assert(tIvfPq < tExact,
      f"IVF-PQ search ($tIvfPq%.1fs) must beat the exact scan ($tExact%.1fs)")
    spark.stop()
  }
}
