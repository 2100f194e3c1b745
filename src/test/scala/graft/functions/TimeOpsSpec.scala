package graft.functions

import graft.SparkSpec
import java.time.{LocalDateTime, ZoneId}
import org.apache.spark.sql.functions._

/** F1/F5/F6/P6/P7/F12 edge semantics (SURVEY.md §5 item 2). */
class TimeOpsSpec extends SparkSpec {

  private def gtfsEpoch(date: String, clock: String, tz: String): Long = {
    import spark.implicits._
    Seq((date, clock)).toDF("d", "c")
      .select(unix_timestamp(TimeOps.gtfsTimestamp(
        to_date(col("d")), col("c"), tz)).as("e"))
      .head().getLong(0)
  }

  test("F1: plain clock, UTC") {
    assert(gtfsEpoch("2024-06-01", "08:30:15", "UTC") ===
      1717200000L + 8 * 3600 + 30 * 60 + 15)
  }

  test("F1: >24h service-day clock rolls into the next day (UTC)") {
    // "25:10:00" on 2024-06-01 = 2024-06-02T01:10:00Z
    assert(gtfsEpoch("2024-06-01", "25:10:00", "UTC") === 1717290600L)
  }

  test("F1: America/Toronto regular offset (EDT, June)") {
    // 08:00 local EDT = 12:00Z
    assert(gtfsEpoch("2024-06-01", "08:00:00", "America/Toronto") ===
      1717200000L + 12 * 3600)
  }

  test("F1: DST spring-forward gap — nonexistent local time shifts forward") {
    // service day 2024-03-09 + 26:30 = wall 2024-03-10 02:30, which does
    // not exist in America/Toronto (clocks jump 02:00→03:00). Engine rule
    // (= java.time / Spark to_utc_timestamp): shift forward by the gap →
    // 03:30 EDT = 07:30Z.
    val got = gtfsEpoch("2024-03-09", "26:30:00", "America/Toronto")
    assert(got === 1710055800L)
    val javaRule = LocalDateTime.of(2024, 3, 10, 2, 30)
      .atZone(ZoneId.of("America/Toronto")).toInstant.getEpochSecond
    assert(got === javaRule)
  }

  test("F1: DST fall-back overlap — ambiguous local time takes the earlier offset") {
    // wall 2024-11-03 01:30 happens twice (EDT then EST). Engine rule:
    // earlier offset (EDT, -4) → 05:30Z.
    val got = gtfsEpoch("2024-11-02", "25:30:00", "America/Toronto")
    assert(got === 1730611800L)
    val javaRule = LocalDateTime.of(2024, 11, 3, 1, 30)
      .atZone(ZoneId.of("America/Toronto")).toInstant.getEpochSecond
    assert(got === javaRule)
  }

  test("F6: all four averageDiffMinutes branches") {
    import spark.implicits._
    // (actualArr, actualDep) epochs; 0 = sentinel. Scheduled fixed at
    // 1000/2000; diffs in minutes.
    val df = Seq(
      (1L, 1600L, 2600L), // both:   ((600)+(600))/120 = 10.0
      (2L, 0L, 2900L),    // deponly: (900)/60        = 15.0
      (3L, 1300L, 0L),    // arronly: (300)/60        = 5.0
      (4L, 0L, 0L)        // neither: NULL
    ).toDF("id", "aa", "ad")
      .select(col("id"), TimeOps.averageDiffMinutes(
        timestamp_seconds(col("aa")), timestamp_seconds(lit(1000L)),
        timestamp_seconds(col("ad")), timestamp_seconds(lit(2000L))).as("avg"))
      .orderBy("id").collect()
    assert(df(0).getDouble(1) === 10.0)
    assert(df(1).getDouble(1) === 15.0)
    assert(df(2).getDouble(1) === 5.0)
    assert(df(3).isNullAt(1))
  }

  test("P6: epoch-0 sentinel becomes NULL, others pass through") {
    import spark.implicits._
    val rows = Seq(0L, 1717200000L).toDF("e")
      .select(TimeOps.nullifyEpochSentinel(timestamp_seconds(col("e"))).as("t"))
      .collect()
    assert(rows(0).isNullAt(0))
    assert(!rows(1).isNullAt(0))
  }

  test("P7: keepObserved drops only double-sentinel rows under the threshold") {
    import spark.implicits._
    val thr = 60000L
    val df = Seq(
      (1L, 0L, 0L, 50000L, 50000L),      // both sentinel, sched below thr → drop
      (2L, 0L, 0L, 70000L, 70000L),      // both sentinel, sched above thr → keep
      (3L, 123L, 0L, 50000L, 50000L),    // arrival observed → keep
      (4L, 0L, 456L, 50000L, 50000L)     // departure observed → keep
    ).toDF("id", "ta", "td", "ga", "gd")
    val kept = df.where(TimeOps.keepObserved(
      timestamp_seconds(col("ta")), timestamp_seconds(col("td")),
      timestamp_seconds(col("ga")), timestamp_seconds(col("gd")), thr))
      .select("id").as[Long].collect().sorted
    assert(kept === Array(2L, 3L, 4L))
  }

  test("F12: runStamp is a single literal instant for the whole run") {
    import spark.implicits._
    val stamp = TimeOps.runStamp()
    val distinct = spark.range(100).select(stamp.as("s"))
      .distinct().count()
    assert(distinct === 1L)
  }
}
