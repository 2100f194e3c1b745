package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming analytics over the realtime observation stream — the
  * dashboard layer for data that never stops arriving. The reference
  * serves A1-A5 from a rebuilt mart (batch); these are the unbounded
  * formulations: event-time windows bounded by a watermark, and keyed
  * custom state via flatMapGroupsWithState. State never grows without
  * bound — the two mechanisms below are exactly Spark's contract for
  * that at 100 TB/day stream rates.
  */
object StreamingAnalytics {

  /** A1 over an unbounded stream: average delay per tumbling event-time
    * window. The watermark bounds both state (windows older than the
    * watermark are finalized and evicted) and lateness (observations
    * later than `watermark` are dropped — the streaming trade the batch
    * mart never has to make). Exact-decimal accumulation keeps results
    * partition-order-independent, like the batch Dashboard. */
  def delayByWindow(stream: DataFrame, eventTimeCol: String,
                    delayCol: String, windowLen: String = "1 hour",
                    watermark: String = "2 hours"): DataFrame =
    stream
      .withWatermark(eventTimeCol, watermark)
      .groupBy(window(col(eventTimeCol), windowLen))
      .agg(
        try_divide(sum(col(delayCol).cast("decimal(20,6)")).cast("double"),
          count(col(delayCol))).as("avg_delay_min"),
        count(lit(1)).as("n_rows"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("avg_delay_min"), col("n_rows"))

  /** One observation for [[lateStreaks]]: (trip, event seconds, delay). */
  final case class Obs(trip_id: String, ts: Long, delay_min: Double)

  /** Emitted when a trip's consecutive-late streak changes. */
  final case class StreakUpdate(trip_id: String, ts: Long, streak: Int)

  /** Keyed custom state the built-in operators cannot express: the length
    * of each trip's CURRENT consecutive-late streak (delay >
    * `lateThreshold`), emitting an update per observation that changes
    * it. State per key is one int — fixed-size, the
    * mapGroupsWithState contract; batch arrivals are folded in event-time
    * order so replays are deterministic. */
  def lateStreaks(stream: Dataset[Obs], lateThreshold: Double)
      : Dataset[StreakUpdate] = {
    import stream.sparkSession.implicits._
    stream.groupByKey(_.trip_id)
      .flatMapGroupsWithState[Int, StreakUpdate](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (trip: String, rows: Iterator[Obs], state: GroupState[Int]) =>
          var streak = state.getOption.getOrElse(0)
          val out = rows.toSeq.sortBy(_.ts).flatMap { o =>
            val next = if (o.delay_min > lateThreshold) streak + 1 else 0
            val changed = next != streak
            streak = next
            if (changed) Some(StreakUpdate(trip, o.ts, next)) else None
          }
          state.update(streak)
          out.iterator
      }
  }
}
