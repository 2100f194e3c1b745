package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Checkpoint-restart exactly-once (q258's harness): a stateful query
  * killed mid-backlog and resumed from its checkpoint must produce the
  * bit-identical final sink, with the recursion crossing the restart
  * boundary through RESTORED state, not driver memory. */
class RestartSpec extends SparkSpec {

  test("replayEwmaTws with restartAfterBatch: two runs of ONE query " +
    "(same id, distinct runIds), 1 then 3 commits, and the sink equals " +
    "the uninterrupted full-history recursion bit-exactly") {
    import spark.implicits._
    // non-dyadic values; T1's history spans all three batches, so its
    // recursion crosses the restart boundary through restored ValueState
    val history = Seq(
      ("T1", 100L, 3.7), ("T2", 110L, 0.3),   // batch 0: ts < 200
      ("T1", 200L, 11.1), ("T1", 250L, 5.9),  // batch 1: 200 <= ts < 300
      ("T1", 300L, 2.2), ("T2", 310L, 8.8))   // batch 2: ts >= 300
    val obs = history.toDF("trip_id", "ts", "delay_min")
    var info: Option[StreamingAnalytics.RestartInfo] = None
    val got = StreamingAnalytics.replayEwmaTws(spark, obs,
        "target/twsrestart_spec", Seq(
        col("ts") < 200L, col("ts") >= 200L && col("ts") < 300L,
        col("ts") >= 300L),
        restartAfterBatch = Some(1), onRestartInfo = i => info = Some(i))
      .collect().map(r => (r.getAs[String]("trip_id"),
        r.getAs[Long]("ts")) -> r.getAs[Double]("ewma")).toMap
    val ref = history.groupBy(_._1).flatMap { case (k, h) =>
      h.sortBy(_._2).scanLeft(Option.empty[(Long, Double)]) {
        case (acc, (_, t, x)) =>
          Some(t -> acc.fold(x) { case (_, prev) => (x + prev) / 2.0 })
      }.flatten.map { case (t, y) => (k, t) -> y }
    }
    assert(got === ref)
    // the restart really split the backlog: the checkpoint carries one
    // query identity across two distinct runs, one commit before the
    // restart and all three after the second run drained the rest
    val i = info.getOrElse(fail("onRestartInfo never fired"))
    assert(i.firstRunId !== i.secondRunId)
    assert(i.commitsAfterFirst === 1)
    assert(i.commitsTotal === 3)
  }

  test("restartAfterBatch rejects a split that would not interrupt " +
    "the backlog") {
    import spark.implicits._
    val obs = Seq(("T1", 100L, 1.0)).toDF("trip_id", "ts", "delay_min")
    intercept[IllegalArgumentException] {
      StreamingAnalytics.replayEwmaTws(spark, obs,
        "target/twsrestart_spec_bad", Seq(col("ts") < 200L),
        restartAfterBatch = Some(1))
    }
  }
}
