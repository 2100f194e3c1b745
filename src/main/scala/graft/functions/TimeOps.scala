package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Time/date scalar operations of the engine, all expressed as pure Column
  * expressions (whole-stage-codegen friendly; no UDFs).
  *
  * Capability map (see SURVEY.md §2.6; reference cited per function):
  *  - F1 gtfsTimestamp   — reference/scripts/historical_extractor.py:26-37
  *  - F5 diffMinutes     — reference/scripts/diff_times.py:58,67
  *  - F6 averageDiffMinutes — reference/scripts/diff_times.py:69-78
  *  - F7 dayType         — reference/scripts/diff_times.py:82-90
  *  - F8 localHour       — reference/scripts/diff_times.py:91
  *  - P6 nullifyEpochSentinel — reference/scripts/diff_times.py:51-54,60-63
  *  - P7 keepObserved    — reference/scripts/diff_times.py:102-106
  */
object TimeOps {

  /** Epoch seconds of a timestamp (floored), the engine's canonical scalar
    * form of `EXTRACT(EPOCH FROM ts)` (F4). */
  def epochSeconds(ts: Column): Column = unix_timestamp(ts)

  /** F1 — GTFS service-day clock normalization. GTFS `HH:MM:SS` strings may
    * have HH >= 24 (e.g. "25:10:00" = 1:10 AM the next service day). Build
    * the local wall-clock instant by pure integer arithmetic on top of the
    * service date, then convert that wall time (interpreted in `tz`) to a
    * UTC instant. On DST-ambiguous/nonexistent local times this follows
    * Spark's `to_utc_timestamp` rule (earliest valid offset) — documented
    * engine semantics (SURVEY.md §7.4).
    */
  def gtfsTimestamp(serviceDate: Column, clock: Column, tz: String): Column = {
    val p = split(clock, ":")
    val h = p.getItem(0).cast("long")
    val m = p.getItem(1).cast("long")
    val s = p.getItem(2).cast("long")
    // serviceDate at 00:00 session-tz(UTC) + clock seconds = naive wall time
    val wall = timestamp_seconds(
      unix_timestamp(serviceDate.cast("timestamp")) + h * 3600L + m * 60L + s)
    if (tz == "UTC") wall else to_utc_timestamp(wall, tz)
  }

  /** F5 — timestamp difference in (fractional) minutes, second precision. */
  def diffMinutes(a: Column, b: Column): Column =
    (unix_timestamp(a) - unix_timestamp(b)) / lit(60.0)

  /** P6 — the reference stores `epoch == 0` timestamps as a "no prediction"
    * sentinel; surface them as NULL. */
  def nullifyEpochSentinel(ts: Column): Column =
    when(unix_timestamp(ts) === 0L, lit(null).cast("timestamp")).otherwise(ts)

  /** Sentinel-aware delay: 0.0 when the observation is the epoch-0 sentinel,
    * else minutes between actual and scheduled (the reference emits 0, not
    * NULL, for missing observations — diff_times.py:56-59,65-68). */
  def sentinelDiffMinutes(actual: Column, scheduled: Column): Column =
    when(unix_timestamp(actual) === 0L, lit(0.0))
      .otherwise(diffMinutes(actual, scheduled))

  /** F6 — 4-branch averaged delay (reference diff_times.py:69-78): both
    * observed → mean of the two diffs; one observed → that diff; neither →
    * NULL. */
  def averageDiffMinutes(actualArr: Column, schedArr: Column,
                         actualDep: Column, schedDep: Column): Column = {
    val aa = unix_timestamp(actualArr); val ad = unix_timestamp(actualDep)
    val da = unix_timestamp(actualArr) - unix_timestamp(schedArr)
    val dd = unix_timestamp(actualDep) - unix_timestamp(schedDep)
    when(aa =!= 0L && ad =!= 0L, (da + dd) / lit(120.0))
      .when(aa === 0L && ad =!= 0L, dd / lit(60.0))
      .when(aa =!= 0L && ad === 0L, da / lit(60.0))
      .otherwise(lit(null).cast("double"))
  }

  /** F7 — weekday name of a UTC instant viewed in `tz` (reference
    * diff_times.py:82-90 spells this as a 7-branch CASE over EXTRACT(DOW);
    * `date_format(…, "EEEE")` yields the identical English names). */
  def dayType(ts: Column, tz: String): Column =
    date_format(if (tz == "UTC") ts else from_utc_timestamp(ts, tz), "EEEE")

  /** F8 — local hour-of-day of a UTC instant viewed in `tz`. */
  def localHour(ts: Column, tz: String): Column =
    hour(if (tz == "UTC") ts else from_utc_timestamp(ts, tz)).cast("long")

  /** F12 — run-stamp semantics: the reference stamps created_at/updated_at
    * with ONE process-level utcnow per run (realtime_extractor.py:185,234),
    * not a per-row clock read. Evaluate the instant once on the driver and
    * embed it as a literal, so every row of the run carries the identical
    * stamp regardless of task scheduling. */
  def runStamp(): Column =
    lit(java.sql.Timestamp.from(java.time.Instant.now()))

  /** P7 — the reference's observed-row filter (diff_times.py:102-106): drop
    * rows where BOTH actual times are the epoch-0 sentinel and the schedule
    * side is below `thresholdSecs` (reference value: 1000*60). The odd
    * threshold is preserved verbatim as a parameter. */
  def keepObserved(tuArr: Column, tuDep: Column, gdArr: Column, gdDep: Column,
                   thresholdSecs: Long): Column =
    !((unix_timestamp(tuArr) === 0L && unix_timestamp(gdArr) <= thresholdSecs) &&
      (unix_timestamp(tuDep) === 0L && unix_timestamp(gdDep) <= thresholdSecs))
}
