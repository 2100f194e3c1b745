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

  test("equalDepth: bin populations are balanced to within one row and " +
    "ordered — every bin-b value sits below every bin-(b+1) value") {
    val rnd = new scala.util.Random(7L)
    // heavy-tailed on purpose: the equal-WIDTH histogram of this data
    // puts almost everything in bin 0; equal depth must still balance
    val xs = (1 to 503).map(i => i.toLong -> math.exp(rnd.nextDouble() * 10))
    val rows = Histogram.equalDepth(xs.toDF("id", "v"), "v", Seq("id"), 8)
      .orderBy("bin").collect()
    val counts = rows.map(r => r.getLong(0) -> r.getLong(1))
    assert(counts.map(_._2).sum === 503L)
    assert(counts.map(_._2).max - counts.map(_._2).min <= 1L)
    // floor((rk-1)*8/n) assigns the SMALLER bins first when n % nBins != 0
    val his = rows.map(r => r.getLong(3))
    val los = rows.map(r => r.getLong(2))
    his.zip(los.drop(1)).foreach { case (hi, nextLo) => assert(hi <= nextLo) }
  }

  test("equalDepth: ties split deterministically by the tie columns and " +
    "fewer rows than bins yields one singleton bin per row") {
    val dup = Seq(1L -> 5.0, 2L -> 5.0, 3L -> 5.0, 4L -> 5.0)
    val rows = Histogram.equalDepth(dup.toDF("id", "v"), "v", Seq("id"), 2)
      .orderBy("bin").collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSeq
      === Seq((0L, 2L), (1L, 2L)))
    val tiny = Histogram.equalDepth(
      Seq(1L -> 1.0, 2L -> 9.0).toDF("id", "v"), "v", Seq("id"), 4)
      .orderBy("bin").collect()
    assert(tiny.map(r => (r.getLong(0), r.getLong(1))).toSeq
      === Seq((0L, 1L), (2L, 1L)))
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
