package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Two stateful operators CHAINED in one streaming query (q259's shape):
  * dropDuplicatesWithinWatermark feeding a watermark-finalized windowed
  * aggregate, with one watermark propagating across both. */
class ChainedStatefulSpec extends SparkSpec {

  private def ts(h: Int, m: Int = 0): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(f"2024-06-01 $h%02d:$m%02d:00")

  test("dedup -> windowed agg in ONE query: the duplicate is dropped " +
    "before the aggregate (counted once), the window finalizes when the " +
    "propagated watermark passes, and the executed query runs TWO " +
    "stateful operators") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val chained = in.toDF.toDF("event_id", "ts", "value")
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(graft.analytics.Dashboard.exactAvg(col("value")).as("avg_value"),
        count(lit(1)).as("n_rows"))
      .select(col("window.start").cast("string").as("window_start"),
        col("avg_value"), col("n_rows"))
    val q = chained.writeStream.format("memory").queryName("chained_agg")
      .outputMode("append").start()
    try {
      // event 7 is delivered twice in the batch (at-least-once source);
      // a third row shares the window
      in.addData((7L, ts(10, 5), 4.0), (7L, ts(10, 5), 4.0),
        (8L, ts(10, 35), 6.0))
      q.processAllAvailable()
      // a re-delivery of 7 in a LATER batch, still within the watermark
      in.addData((7L, ts(10, 20), 4.0))
      q.processAllAvailable()
      assert(spark.table("chained_agg").count() === 0L) // not finalized yet
      // watermark riser: 12:30 - 1h = 11:30 > 11:00 seals the 10:00 window
      in.addData((9L, ts(12, 30), 1.0))
      q.processAllAvailable()
      val got = spark.table("chained_agg")
        .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
      // duplicate dropped upstream: 2 rows, avg (4+6)/2 — if the agg ran
      // on the raw stream it would read 3-4 rows and a different average
      assert(got.toSeq === Seq(("2024-06-01 10:00:00", 5.0, 2L)))
      // the one executed query really chains two stateful operators
      val ops = q.lastProgress.stateOperators.map(_.operatorName).toSeq
      assert(ops.length === 2, s"expected 2 stateful operators, got $ops")
      assert(ops.exists(_.toLowerCase.contains("dedup")), ops.toString)
      // the aggregate's state operator reports as stateStoreSave
      assert(ops.exists(o => o.toLowerCase.contains("statestoresave") ||
        o.toLowerCase.contains("aggregat")), ops.toString)
    } finally q.stop()
  }

  test("stream-stream interval join -> windowed agg in ONE query " +
    "(q262's shape): pair counts finalize per window once the watermark " +
    "propagates through the join, and the plan runs two stateful " +
    "operators") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[(Long, String, java.sql.Timestamp)]
    val st = in.toDF.toDF("user_id", "event_type", "ts")
    val l = st.where(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("l_ts"))
      .withWatermark("l_ts", "10 minutes")
    val r = st.where(col("event_type") === "purchase")
      .select(col("user_id").as("r_user_id"), col("ts").as("r_ts"))
      .withWatermark("r_ts", "10 minutes")
    val chained = l.join(r, col("user_id") === col("r_user_id") &&
        col("r_ts") >= col("l_ts") - expr("INTERVAL 3600 seconds") &&
        col("r_ts") <= col("l_ts") + expr("INTERVAL 3600 seconds"))
      .select(col("l_ts"))
      .groupBy(window(col("l_ts"), "1 hour"))
      .agg(count(lit(1)).as("n_pairs"))
      .select(col("window.start").cast("string").as("window_start"),
        col("n_pairs"))
    val q = chained.writeStream.format("memory").queryName("join_agg")
      .outputMode("append").start()
    def ts(h: Int, m: Int = 0): java.sql.Timestamp =
      java.sql.Timestamp.valueOf(f"2024-06-01 $h%02d:$m%02d:00")
    try {
      // two pairs in the 10:00 window: u2 within-batch; u1 CROSS-batch,
      // its purchase (10:40, batch 2) above the propagated watermark
      // (10:20 after batch 1) and within the 1 h interval of the
      // buffered 10:05 click
      in.addData((1L, "click", ts(10, 5)), (2L, "click", ts(10, 30)),
        (2L, "purchase", ts(10, 35)))
      q.processAllAvailable()
      in.addData((1L, "purchase", ts(10, 40)))
      q.processAllAvailable()
      assert(spark.table("join_agg").count() === 0L) // window still open
      // risers on BOTH sides push the propagated watermark past 11:00
      // (the join delays the downstream watermark by the interval, so
      // go far past); the risers' own windows finalize or not depending
      // on that delay — assert only the real window
      in.addData((8L, "click", ts(20)), (8L, "purchase", ts(20, 1)))
      q.processAllAvailable()
      in.addData((9L, "click", ts(23, 30)), (9L, "purchase", ts(23, 31)))
      q.processAllAvailable()
      val got = spark.table("join_agg")
        .where(col("window_start") < "2024-06-01 12:00:00")
        .collect()
        .map(r => (r.getString(0), r.getLong(1))).toSeq.sorted
      assert(got === Seq(("2024-06-01 10:00:00", 2L)))
      val ops = q.lastProgress.stateOperators.map(_.operatorName).toSeq
      assert(ops.length === 2, s"expected 2 stateful operators, got $ops")
      assert(ops.exists(_.toLowerCase.contains("join")), ops.toString)
    } finally q.stop()
  }
}
