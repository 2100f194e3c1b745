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

  test("rollup emits the grand-total row") {
    val rows = Dashboard.delayRollup(
      mart.withColumn("day_type", lit("Monday"))).collect()
    assert(rows.exists(r => r.isNullAt(0) && r.isNullAt(1))) // grand total
    assert(rows.exists(r => !r.isNullAt(0) && r.isNullAt(1))) // per-day subtotal
  }
}
