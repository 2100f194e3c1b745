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
      .agg(graft.analytics.Dashboard.exactAvg(col(delayCol)).as("avg_delay_min"),
        count(lit(1)).as("n_rows"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("avg_delay_min"), col("n_rows"))

  /** One observation for [[lateStreaks]]: (trip, event seconds, delay). */
  final case class Obs(trip_id: String, ts: Long, delay_min: Double)

  /** Emitted when a trip's consecutive-late streak changes. */
  final case class StreakUpdate(trip_id: String, ts: Long, streak: Int)

  /** Streaming exact deduplication: drop repeated keys arriving within
    * the watermark of each other — the at-least-once-source guard in
    * front of any streaming pipeline. State holds one entry per key seen
    * within the watermark horizon and is evicted as the watermark
    * advances — bounded, unlike a naive global dropDuplicates whose state
    * grows forever. `eventTimeCol` must be a timestamp column. */
  def dedupStream(stream: DataFrame, keys: Seq[String], eventTimeCol: String,
                  watermark: String): DataFrame =
    stream.withWatermark(eventTimeCol, watermark)
      .dropDuplicatesWithinWatermark(keys)

  /** One event for [[sessionizeStream]] — needs a real timestamp column
    * so the watermark (and event-time timeouts) can track it. */
  final case class SEvent(key: String, event_time: java.sql.Timestamp)

  /** A closed session: emitted when the gap passes or the watermark
    * overtakes the session's timeout. */
  final case class Session(key: String, start_epoch: Long, end_epoch: Long,
                           n_events: Long)

  /** Open-session state for [[sessionizeStream]] (public: the runtime
    * compiles an encoder for it). */
  final case class OpenSession(startEpoch: Long, endEpoch: Long,
                               nEvents: Long)

  /** Streaming gap-sessionization — [[graft.operators.Sessionize]]'s
    * unbounded sibling: sessions close either when a later event of the
    * same key arrives past the gap, or when the WATERMARK passes the open
    * session's gap deadline (EventTimeTimeout) — so idle keys emit their
    * last session instead of holding state forever. State per key is one
    * (start, end, n) triple: fixed-size, the flatMapGroupsWithState
    * contract at any key cardinality. */
  def sessionizeStream(events: Dataset[SEvent], gapSeconds: Long,
                       watermark: String = "0 seconds"): Dataset[Session] = {
    import events.sparkSession.implicits._
    events.withWatermark("event_time", watermark)
      .groupByKey(_.key)
      .flatMapGroupsWithState[OpenSession, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: String, rows: Iterator[SEvent], state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(Session(key, s.startEpoch, s.endEpoch, s.nEvents))
          } else {
            val times = rows.map(_.event_time.getTime / 1000).toSeq.sorted
            val closed = Seq.newBuilder[Session]
            var cur = state.getOption
            times.foreach { t =>
              cur = cur match {
                case Some(s) if t >= s.startEpoch && t - s.endEpoch <= gapSeconds =>
                  Some(OpenSession(s.startEpoch, math.max(s.endEpoch, t),
                    s.nEvents + 1))
                case Some(s) if t < s.startEpoch =>
                  // within-watermark arrival BEFORE the open session (only
                  // possible across batches — within a batch times are
                  // sorted): extend the session backward when within the
                  // gap of its start, matching what batch Sessionize would
                  // have computed; otherwise the event is its own session,
                  // already closed (nothing later can merge with it —
                  // everything after the open session's start is >= start).
                  if (s.startEpoch - t <= gapSeconds)
                    Some(OpenSession(t, s.endEpoch, s.nEvents + 1))
                  else {
                    closed += Session(key, t, t, 1)
                    Some(s)
                  }
                case Some(s) =>
                  closed += Session(key, s.startEpoch, s.endEpoch, s.nEvents)
                  Some(OpenSession(t, t, 1))
                case None => Some(OpenSession(t, t, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // clamp above the watermark: a deadline computed from a
              // late-arriving event would be below it, which
              // setTimeoutTimestamp rejects (killing the query). Current
              // Spark filters late rows before the operator, but the
              // clamp keeps the contract version-independent.
              state.setTimeoutTimestamp(
                math.max((s.endEpoch + gapSeconds) * 1000L + 1L,
                  state.getCurrentWatermarkMs() + 1L))
            }
            closed.result().iterator
          }
      }
  }

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
