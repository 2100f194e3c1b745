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
}
