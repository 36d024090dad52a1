package graft.stats

import org.scalatest.funsuite.AnyFunSuite

/** Port tests for the reference's Statistics histogram machinery
  * (`GraphView/Statistics.cs`), per SURVEY §5.3.
  */
class HistogramSpec extends AnyFunSuite {

  test("build: height-balanced, bucket cap, equal keys stay together") {
    val h = Histogram.build((1L to 100000L) ++ (1L to 100000L))
    assert(h.buckets.size <= Histogram.BucketNum)
    assert(h.totalRows == 200000.0)
    // equal values never split: a run of one hot value lands in one bucket
    val hot = Histogram.build(Seq.fill(500)(42L) ++ (1L to 100L))
    val hotBuckets = hot.buckets.filter(b => b.upper >= 42L)
    assert(hot.totalRows == 600.0)
    assert(hotBuckets.exists(_.rows >= 500.0))
  }

  test("identical uniform histograms join at ~1/ndv selectivity") {
    val vals = (1L to 1000L)
    val h = Histogram.build(vals)
    val (joined, sel) = Histogram.joinSelectivity(h, h)
    // each of 1000 keys matches exactly once: joined ≈ 1000, sel ≈ 1e-3
    assert(math.abs(joined - 1000.0) / 1000.0 < 0.25, s"joined=$joined")
    assert(sel > 0.5e-3 && sel < 2e-3, s"sel=$sel")
  }

  test("disjoint domains join empty") {
    val h1 = Histogram.build(1L to 1000L)
    val h2 = Histogram.build(5000L to 6000L)
    val (joined, sel) = Histogram.joinSelectivity(h1, h2)
    assert(joined == 0.0 && sel == 0.0)
  }

  test("skewed hot key raises join selectivity above uniform") {
    val uniform = Histogram.build(1L to 1000L)
    val skewed = Histogram.build(Seq.fill(900)(7L) ++ (1L to 100L))
    val (_, selUniform) = Histogram.joinSelectivity(uniform, uniform)
    val (_, selSkew) = Histogram.joinSelectivity(skewed, skewed)
    assert(selSkew > selUniform)
  }

  test("empty histogram yields zero selectivity, default density stands in") {
    val h = Histogram.build(Nil)
    assert(Histogram.joinSelectivity(h, h) == ((0.0, 0.0)))
    assert(math.abs(Histogram.DefaultDensity - 0.0316228) < 1e-9)
  }
}
