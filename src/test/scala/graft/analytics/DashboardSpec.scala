package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Dashboard aggregation semantics. */
class DashboardSpec extends SparkSpec {

  private lazy val mart = {
    import spark.implicits._
    (1L to 2000L).map(i =>
      (s"trip_${i % 97}", i % 24, (i % 13).toDouble, s"g${i % 3}"))
      .toDF("trip_id", "sudbury_hour_of_day", "average_diff_in_minutes",
        "weather_group")
  }

  test("exactAvg is partition-order independent") {
    val one = Dashboard.avgDelayByHour(mart.coalesce(1)).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val many = Dashboard.avgDelayByHour(mart.repartition(7)).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(one === many)
  }

  test("peakHoursApprox tracks the exact distinct count within tolerance") {
    val exact = Dashboard.peakHours(mart).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val approx = Dashboard.peakHoursApprox(mart, rsd = 0.02).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(approx.keySet === exact.keySet)
    exact.foreach { case (h, n) =>
      assert(math.abs(approx(h) - n) <= math.max(2L, (n * 0.1).toLong),
        s"hour $h: approx ${approx(h)} vs exact $n")
    }
  }

  test("percentile_approx (q151's GK sketch) honors the rank guarantee " +
    "|rank(est) - phi*N| <= eps*N at accuracy 100, and is " +
    "partition-count independent given the same input") {
    import spark.implicits._
    // a skewed long-tailed distribution, shuffled deterministically
    val n = 10000
    val values = (0 until n).map(i => (i.toLong * i) % 7919L)
      .sortBy(v => (v * 2654435761L) % 1000003L)
    val df = values.toDF("x").repartition(8)
    val est = df.agg(
        expr("percentile_approx(x, array(0.5D, 0.9D, 0.99D), 100)").as("p"))
      .collect().head.getSeq[Long](0)
    val sorted = values.sorted
    for ((phi, e) <- Seq(0.5, 0.9, 0.99).zip(est)) {
      val rank = sorted.count(_ <= e)
      // GK at accuracy a guarantees eps = 1/a rank error; +1 absorbs
      // the <= / < boundary convention
      assert(math.abs(rank - phi * n) <= n / 100 + 1,
        s"phi=$phi est=$e rank=$rank")
    }
  }

  test("rollup emits the grand-total row") {
    val rows = Dashboard.delayRollup(
      mart.withColumn("day_type", lit("Monday"))).collect()
    assert(rows.exists(r => r.isNullAt(0) && r.isNullAt(1))) // grand total
    assert(rows.exists(r => !r.isNullAt(0) && r.isNullAt(1))) // per-day subtotal
  }
}
