package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The aggregation layer the reference's Looker Studio dashboard performs
  * over the diffs mart (SURVEY.md §2.4 A1-A5; reference README.md:193-209).
  *
  * Averages are computed as exact decimal sums divided by counts so results
  * are reproducible regardless of partial-aggregation order — the
  * double-summation order across 1000 executors is otherwise
  * non-deterministic in the last ulp.
  */
object Dashboard {

  /** Order-insensitive exact average: decimal(20,6) accumulate → double.
    * try_divide: a group whose values are all NULL has count 0 — that must
    * be a NULL average (as in SQL), not an ANSI DIVIDE_BY_ZERO error. */
  def exactAvg(c: Column): Column =
    try_divide(sum(c.cast("decimal(20,6)")).cast("double"), count(c))

  /** Order-insensitive exact Pearson correlation: the five sufficient
    * statistics (Σx, Σy, Σxy, Σx², Σy²) accumulate as EXACT decimals —
    * decimal(15,6) inputs so the products stay inside decimal(38,12)
    * in any ANSI engine — and only the final closed-form combination
    * runs in doubles, as a fixed operation sequence an oracle mirrors
    * op-for-op. Degenerate variance (constant column) → NULL via
    * try_divide, not an error. Rows with a NULL in either column must
    * be filtered by the caller (so n counts complete pairs). */
  def exactCorr(x: Column, y: Column): Column = {
    val dx = x.cast("decimal(15,6)")
    val dy = y.cast("decimal(15,6)")
    val n = count(lit(1)).cast("double")
    val sx = sum(dx).cast("double")
    val sy = sum(dy).cast("double")
    val sxy = sum(dx * dy).cast("double")
    val sxx = sum(dx * dx).cast("double")
    val syy = sum(dy * dy).cast("double")
    try_divide(n * sxy - sx * sy,
      sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy))
  }

  /** A1 — average delay by local hour of day. */
  def avgDelayByHour(mart: DataFrame): DataFrame =
    mart.groupBy("sudbury_hour_of_day")
      .agg(exactAvg(col("average_diff_in_minutes")).as("avg_delay_min"),
        count(lit(1)).as("n_rows"))

  /** A2 — A1 with the dashboard's slicers applied. */
  def avgDelayByHourSliced(mart: DataFrame,
                           weatherGroup: Option[String] = None,
                           routeId: Option[String] = None,
                           dayType: Option[String] = None): DataFrame = {
    val preds = Seq(
      weatherGroup.map(col("weather_group") === _),
      routeId.map(col("route_id") === _),
      dayType.map(col("day_type") === _)).flatten
    avgDelayByHour(preds.foldLeft(mart)((df, p) => df.where(p)))
  }

  /** A3 — peak-hour analysis: busiest hours by distinct trips. */
  def peakHours(mart: DataFrame): DataFrame =
    mart.groupBy("sudbury_hour_of_day")
      .agg(countDistinct(col("trip_id")).as("n_trips"),
        count(lit(1)).as("n_rows"))

  /** A3 at scale: exact countDistinct shuffles every distinct (hour,
    * trip_id) pair; the HLL sketch shuffles one fixed-size buffer per
    * group per partition instead — the 100 TB formulation when ±rsd error
    * is acceptable for a dashboard. */
  def peakHoursApprox(mart: DataFrame, rsd: Double = 0.02): DataFrame =
    mart.groupBy("sudbury_hour_of_day")
      .agg(approx_count_distinct(col("trip_id"), rsd).as("n_trips"),
        count(lit(1)).as("n_rows"))

  /** A4 — stop/route density heat-map input. */
  def stopDensity(mart: DataFrame): DataFrame =
    mart.groupBy("geo_coordinates", "stop_name")
      .agg(count(lit(1)).as("n_rows"))

  /** A5 — multi-dim rollup (day × hour) for the heatmap. Grouping columns
    * are passed as unresolved `col()` refs: the eager string-based overload
    * trips Spark's ambiguous-self-join detector on marts whose lineage
    * contains a self-join. */
  def delayRollup(mart: DataFrame): DataFrame =
    mart.rollup(col("day_type"), col("sudbury_hour_of_day"))
      .agg(exactAvg(col("average_diff_in_minutes")).as("avg_delay_min"),
        count(lit(1)).as("n_rows"))
}
