package graft.pipelines

import graft.functions.TimeOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** E3 — the reference's analytical core (`reference/scripts/diff_times.py:
  * 41-110`): realtime observations equi-joined to the schedule on the
  * 4-column composite key, sentinel-aware delay math, local-time dimensions,
  * observed-row filter, and a globally sorted mart.
  *
  * Scale notes: both sides are large fact tables, so the join is a shuffle
  * join hash-partitioned on the composite key — exactly what a 1000-executor
  * cluster wants (no driver-side state, no broadcast of a 100 TB side). The
  * final `orderBy` is a range-partitioned total sort; downstream dashboard
  * aggregations (analytics.Dashboard) do not rely on it.
  */
object DiffTimes {

  /** Expected realtime (`tu`) schema: trip_id string, start_date date,
    * stop_sequence long, stop_id STRING (cast to long at join time, as in
    * the reference), arrival_time/departure_time timestamp (epoch-0
    * sentinel = no prediction), weather_group, weather_description,
    * temperature, created_at, updated_at.
    *
    * Expected schedule (`gd`) schema: trip_id, start_date, stop_sequence,
    * stop_id LONG, route_id, stop_name, route_long_name,
    * arrival_time/departure_time timestamp, geo_coordinates.
    */
  def build(tu: DataFrame, gd: DataFrame,
            tz: String = "America/Toronto",
            sentinelThresholdSecs: Long = 1000L * 60L): DataFrame = {
    val t = tu.as("tu")
    val g = gd.as("gd")
    // try_cast (P5): realtime stop_ids are strings from the wire — a
    // non-numeric one must fail to MATCH (NULL key joins nothing), not
    // throw under ANSI and abort the whole mart build.
    val joined = t.join(g,
      col("tu.trip_id") === col("gd.trip_id") &&
        col("tu.start_date") === col("gd.start_date") &&
        col("tu.stop_sequence") === col("gd.stop_sequence") &&
        col("tu.stop_id").try_cast("long") === col("gd.stop_id"),
      "inner")

    val aArr = col("tu.arrival_time"); val sArr = col("gd.arrival_time")
    val aDep = col("tu.departure_time"); val sDep = col("gd.departure_time")

    joined
      .where(TimeOps.keepObserved(aArr, aDep, sArr, sDep, sentinelThresholdSecs))
      .select(
        col("tu.trip_id").as("trip_id"),
        col("tu.start_date").as("start_date"),
        col("tu.stop_sequence").as("stop_sequence"),
        col("tu.stop_id").try_cast("long").as("stop_id"),
        col("gd.route_id").as("route_id"),
        col("gd.stop_name").as("stop_name"),
        col("gd.route_long_name").as("route_long_name"),
        TimeOps.nullifyEpochSentinel(aArr).as("actual_arrival_time"),
        sArr.as("scheduled_arrival_time"),
        TimeOps.sentinelDiffMinutes(aArr, sArr).as("arrival_time_diff_in_minutes"),
        TimeOps.nullifyEpochSentinel(aDep).as("actual_departure_time"),
        sDep.as("scheduled_departure_time"),
        TimeOps.sentinelDiffMinutes(aDep, sDep).as("departure_time_diff_in_minutes"),
        TimeOps.averageDiffMinutes(aArr, sArr, aDep, sDep).as("average_diff_in_minutes"),
        col("tu.weather_group").as("weather_group"),
        col("tu.weather_description").as("weather_description"),
        col("tu.temperature").as("temperature"),
        TimeOps.dayType(sArr, tz).as("day_type"),
        TimeOps.localHour(sArr, tz).as("sudbury_hour_of_day"),
        col("gd.geo_coordinates").as("geo_coordinates"),
        col("tu.created_at").as("created_at"),
        col("tu.updated_at").as("updated_at"))
      .orderBy(asc("trip_id"), asc("stop_sequence"), asc("start_date"))
  }

  /** Materialize the mart partitioned by service date (SURVEY.md §4):
    * dashboard aggregations slice by day, so date-partitioned storage lets
    * their scans prune whole partitions instead of reading the full mart —
    * at 100 TB the difference between touching one day and all of them. */
  def writeMart(mart: DataFrame, path: String): Unit =
    mart.write.mode("overwrite").partitionBy("start_date").parquet(path)

  /** Incremental refresh — the 100 TB alternative to the reference's
    * truncate-and-rebuild (S11, diff_times.py:77): dynamic partition
    * overwrite replaces ONLY the service-date partitions present in
    * `martUpdates`, leaving every other day's files untouched. A daily
    * tick rewrites one day, not the corpus; the full rebuild stays
    * available as [[writeMart]] for backfills. */
  def refreshMart(martUpdates: DataFrame, path: String): Unit = {
    val spark = martUpdates.sparkSession
    val key = "spark.sql.sources.partitionOverwriteMode"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "dynamic")
    try martUpdates.write.mode("overwrite").partitionBy("start_date")
      .parquet(path)
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }
}
