package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Equal-width histogram of a numeric column — the distribution readout
  * every profiling dashboard needs between q105's min/max and q50's exact
  * percentiles (reference analog: the delay-distribution views of
  * scripts/dashboard.py, which bucket client-side; here the bucketing is
  * the engine's job).
  *
  * Shape at 100 TB: pass 1 is a 1-row min/max aggregate (map-side
  * combined, broadcast back); pass 2 assigns each row a bin with pure
  * arithmetic against that broadcast row and aggregates — the shuffle
  * carries at most nBins rows PER PARTITION, never data. No sort, no
  * window, no collect.
  *
  * Hash-check design: bin assignment is `floor((x - lo) * nBins / (hi -
  * lo))` clamped to nBins-1 — Spark's `floor(double)` already returns
  * BIGINT and the oracle casts its DOUBLE floor to BIGINT, so bin ids are
  * exact; bin edges are emitted in q105's micro-unit integer rendering
  * (floor(x·1e6 + 0.5)) because shortest-roundtrip double formatting
  * diverges between engines. A degenerate column (hi = lo) puts every row
  * in bin 0 instead of dividing by zero — mirrored CASE both sides. */
object Histogram {

  private def micro(c: Column): Column =
    floor(c * lit(1000000.0) + lit(0.5)).cast("long")

  /** Equal-DEPTH (quantile) binning — the feature-engineering sibling of
    * [[equalWidth]]: bins hold (near-)equal ROW counts instead of equal
    * value spans, which is what a skewed price/delay/length column needs
    * before bucketized training or stratified reporting (an equal-width
    * histogram of a heavy-tailed column puts 99% of rows in bin 0).
    *
    * Interpolated-percentile boundaries are deliberately avoided: Spark
    * and DuckDB spell quantile interpolation with different operation
    * orders, so boundary doubles drift by ulps and the bin of a row AT a
    * boundary flips. Instead the bin is pure INTEGER arithmetic on the
    * exact global rank: `bin = (rank-1)·nBins DIV n`. Rank comes from
    * [[Rank.globalRank]] — two passes, range-partitioned, NO single-task
    * window — so the operator keeps the 100 TB shape: sort-shuffle +
    * #partition-bounded offset join + one nBins-bounded aggregate.
    * `tieCols` must make the sort total (a unique key): equal values are
    * then assigned to bins deterministically, identically in both
    * engines.
    *
    * Returns (bin, n, lo_micro, hi_micro) — observed per-bin bounds in
    * the micro-unit integer rendering, one row per non-empty bin (bins
    * can only be empty when n < nBins). */
  def equalDepth(df: DataFrame, valueCol: String, tieCols: Seq[String],
                 nBins: Int): DataFrame = {
    require(nBins > 0, s"equalDepth: nBins must be positive, got $nBins")
    val xs = df.select((col(valueCol).cast("double").as("__x") +:
        tieCols.map(col)): _*)
      .where(col("__x").isNotNull)
    val n = xs.agg(count(lit(1)).as("__n"))
    val ranked = Rank.globalRank(xs,
      col("__x") +: tieCols.map(col), "__rk")
    ranked.crossJoin(broadcast(n))
      .select(expr(s"(__rk - 1L) * ${nBins}L DIV __n").as("bin"),
        col("__x"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), micro(min(col("__x"))).as("lo_micro"),
        micro(max(col("__x"))).as("hi_micro"))
  }

  /** (bin, bin_lo_micro, bin_hi_micro, n) — one row per NON-EMPTY bin
    * (empty bins are absent, like the SQL GROUP BY; densify with q139's
    * spine join if a chart needs zeros). NULL values are excluded before
    * min/max so they can never poison the range. */
  def equalWidth(df: DataFrame, valueCol: String, nBins: Int): DataFrame = {
    require(nBins > 0, s"equalWidth: nBins must be positive, got $nBins")
    val xs = df.select(col(valueCol).cast("double").as("__x"))
      .where(col("__x").isNotNull)
    val mm = xs.agg(min(col("__x")).as("lo"), max(col("__x")).as("hi"))
    val w = col("hi") - col("lo")
    val raw = floor((col("__x") - col("lo")) * lit(nBins.toDouble) / w)
    val bin = when(w === lit(0.0), lit(0L))
      .otherwise(least(lit(nBins.toLong - 1L), raw.cast("long")))
    val nb = lit(nBins.toDouble)
    xs.crossJoin(broadcast(mm))
      .select(bin.as("bin"), col("lo"), col("hi"))
      .groupBy("bin", "lo", "hi")
      .agg(count(lit(1)).as("n"))
      .select(col("bin"),
        micro(col("lo") + col("bin").cast("double") * (col("hi") - col("lo")) / nb)
          .as("bin_lo_micro"),
        micro(col("lo") + (col("bin") + lit(1L)).cast("double") * (col("hi") - col("lo")) / nb)
          .as("bin_hi_micro"),
        col("n"))
  }
}
