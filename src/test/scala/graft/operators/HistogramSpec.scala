package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Histogram.equalWidth: parity with a naive in-memory binning, count
  * conservation, edge geometry, and the degenerate/NULL paths. */
class HistogramSpec extends SparkSpec {

  import spark.implicits._

  private def naive(xs: Seq[Double], nBins: Int): Map[Long, Long] = {
    val lo = xs.min
    val hi = xs.max
    xs.map { x =>
      if (hi == lo) 0L
      else math.min(nBins - 1L, math.floor((x - lo) * nBins / (hi - lo)).toLong)
    }.groupBy(identity).map { case (b, g) => b -> g.size.toLong }
  }

  test("matches the naive binning and conserves the row count") {
    val rnd = new scala.util.Random(3L)
    val xs = Seq.fill(500)(rnd.nextDouble() * 100.0 - 50.0)
    val got = Histogram.equalWidth(xs.toDF("v"), "v", nBins = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got === naive(xs, 8))
    assert(got.values.sum === 500L)
  }

  test("bin edges tile [lo, hi] contiguously in micro-units") {
    val xs = Seq(0.0, 1.0, 2.5, 7.75, 10.0)
    val rows = Histogram.equalWidth(xs.toDF("v"), "v", nBins = 4)
      .orderBy("bin").collect()
    // contiguous: each bin's hi edge is the next bin's lo edge
    rows.sliding(2).foreach {
      case Array(a, b) =>
        if (b.getLong(0) == a.getLong(0) + 1)
          assert(a.getLong(2) === b.getLong(1))
      case _ =>
    }
    // the full range is covered: first lo = min·1e6, last hi = max·1e6
    assert(rows.head.getLong(1) === 0L)
    assert(rows.last.getLong(2) === 10000000L)
    // the max value lands in the LAST bin (clamp, not a phantom bin 4)
    assert(rows.last.getLong(0) === 3L)
  }

  test("degenerate single-value column yields one bin 0, not div-by-zero") {
    val rows = Histogram.equalWidth(
      Seq(5.0, 5.0, 5.0).toDF("v"), "v", nBins = 10).collect()
    assert(rows.length === 1)
    assert(rows.head.getLong(0) === 0L)
    assert(rows.head.getLong(3) === 3L)
  }

  test("NULL values are excluded before the range is computed") {
    val rows = Seq[Option[Double]](Some(1.0), None, Some(3.0), None)
      .toDF("v")
    val got = Histogram.equalWidth(rows, "v", nBins = 2)
      .orderBy("bin").collect()
    assert(got.map(_.getLong(3)).sum === 2L)
    // range is [1,3] from the non-null values, so 1.0 → bin 0, 3.0 → bin 1
    assert(got.map(r => r.getLong(0) -> r.getLong(3)).toMap ===
      Map(0L -> 1L, 1L -> 1L))
  }
}
