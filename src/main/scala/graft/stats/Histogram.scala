package graft.stats

/** Height-balanced histogram + join-selectivity estimation — the port of
  * the reference's `GraphView/Statistics.cs` (build at 224-322, merge/
  * intersect at 68-216): at most [[Histogram.BucketNum]] buckets, each
  * bucket = (upper bound, row count, distinct count); join selectivity of
  * two histograms = estimated joined rows / (rows₁ · rows₂), computed by
  * walking both bucket lists and, per overlapping range, taking
  * rows₁·rows₂/max(ndv) (the containment assumption the reference
  * inherits from SQL Server).
  */
final case class Bucket(upper: Long, rows: Double, ndv: Double)

final case class Histogram(buckets: Vector[Bucket], min: Long = Long.MinValue) {
  def totalRows: Double = buckets.map(_.rows).sum
}

object Histogram {
  /** bucket cap, reference `Statistics.BucketNum` (`Statistics.cs:40`) */
  val BucketNum = 200

  /** default density when no histogram exists — `Statistics.cs:38`,
    * 1/√1000, the SQL Server convention
    */
  val DefaultDensity = 0.0316228

  /** Build a height-balanced histogram from sampled key values
    * (`Statistics.cs:232-320`): sort, split into ≤BucketNum equal-height
    * runs, never splitting one value across buckets.
    */
  def build(values: Seq[Long]): Histogram = {
    if (values.isEmpty) return Histogram(Vector.empty)
    val sorted = values.sorted
    val perBucket = math.max(1, math.ceil(sorted.size.toDouble / BucketNum).toInt)
    val buckets = Vector.newBuilder[Bucket]
    var i = 0
    while (i < sorted.size) {
      var j = math.min(i + perBucket, sorted.size)
      // extend so equal values stay in one bucket
      while (j < sorted.size && sorted(j) == sorted(j - 1)) j += 1
      val slice = sorted.slice(i, j)
      buckets += Bucket(slice.last, slice.size.toDouble,
        slice.distinct.size.toDouble)
      i = j
    }
    Histogram(buckets.result(), sorted.head)
  }

  /** Join selectivity of two histograms over the same key domain — the
    * `UpdateHistogram` walk (`Statistics.cs:68-216`): two-pointer sweep
    * over bucket ranges; for every overlapping range the joined-row
    * estimate is (rows₁·f₁)·(rows₂·f₂)/max(ndv₁·f₁, ndv₂·f₂) under the
    * containment assumption, with f = the uniform fraction of the bucket
    * inside the overlap. Returns (joinedRows, joined/(r1·r2))
    * (`Statistics.cs:208`).
    */
  def joinSelectivity(h1: Histogram, h2: Histogram): (Double, Double) = {
    val r1 = h1.totalRows
    val r2 = h2.totalRows
    if (r1 == 0 || r2 == 0) return (0.0, 0.0)
    val b1 = h1.buckets
    val b2 = h2.buckets
    // bucket ranges are (lower(k), upper(k)]; first lower = own min - 1
    def lower(h: Histogram, k: Int): Long =
      if (k == 0) h.min - 1 else h.buckets(k - 1).upper
    var joined = 0.0
    var i = 0
    var j = 0
    while (i < b1.size && j < b2.size) {
      val (l1, u1) = (lower(h1, i), b1(i).upper)
      val (l2, u2) = (lower(h2, j), b2(j).upper)
      val lo = math.max(l1, l2)
      val hi = math.min(u1, u2)
      if (hi > lo) {
        val f1 = (hi - lo).toDouble / math.max(u1 - l1, 1L)
        val f2 = (hi - lo).toDouble / math.max(u2 - l2, 1L)
        joined += (b1(i).rows * f1) * (b2(j).rows * f2) /
          math.max(math.max(b1(i).ndv * f1, b2(j).ndv * f2), 1.0)
      }
      if (u1 <= hi || u1 <= u2) i += 1
      if (u2 <= hi || u2 <= u1) j += 1
    }
    (joined, math.min(joined / (r1 * r2), 1.0))
  }
}
