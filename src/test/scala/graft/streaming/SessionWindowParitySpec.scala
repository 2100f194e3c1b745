package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Native `session_window` vs the custom [[StreamingAnalytics.sessionizeStream]]
  * (q260 vs q255): where the one-liner agrees with the exact state
  * machine, pinned — boundary semantics, and the out-of-order bridge
  * case that motivated the custom operator. */
class SessionWindowParitySpec extends SparkSpec {

  test("equality boundary: an event exactly `gap` after a session's last " +
    "event MERGES in native session_window, matching the custom/q44 " +
    "`diff > gap starts new` spelling") {
    import spark.implicits._
    // 0s and 10s with a 10s gap: native initial windows [0,10) and
    // [10,20) touch — one session; 25s (diff 15 > 10) starts a new one
    val df = Seq(("a", 0L), ("a", 10L), ("a", 25L))
      .toDF("k", "tse")
      .select(col("k"), timestamp_seconds(col("tse")).as("ts"))
    val native = df.groupBy(col("k"), session_window(col("ts"), "10 seconds"))
      .agg(min(unix_timestamp(col("ts"))).as("s"),
        max(unix_timestamp(col("ts"))).as("e"),
        count(lit(1)).as("n"))
      .select("s", "e", "n")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    assert(native === Seq((0L, 10L, 2L), (25L, 25L, 1L)))
    // the batch Sessionize operator draws the identical boundary
    val custom = graft.operators.Sessionize.assignSessions(
        Seq(("a", 0L), ("a", 10L), ("a", 25L)).toDF("k", "tse"),
        Seq("k"), "tse", "tse", gapSeconds = 10L)
      .groupBy("session_seq")
      .agg(min("tse").as("s"), max("tse").as("e"), count(lit(1)).as("n"))
      .select("s", "e", "n")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    assert(custom === native)
  }

  test("sub-second timestamps: native session_window at raw microsecond " +
    "precision SPLITS a pair whose floored diff equals the gap but whose " +
    "real diff exceeds it — flooring to whole seconds first (q260's " +
    "spelling) restores parity with the floor-epoch oracle") {
    import spark.implicits._
    // gap 10 s; events at 5.9 s and 15.95 s: floored epochs 5 and 15,
    // floored diff 10 == gap (the oracle's `diff > gap` does NOT start a
    // new session → merge), but real diff 10.05 s > gap (native split).
    // This is the exact sf0.1 user-805 shape from ADVICE r14.
    val ev = Seq(("a", 5900000L), ("a", 15950000L))
      .toDF("k", "us")
      .select(col("k"), timestamp_micros(col("us")).as("raw_ts"))
    def sessions(tsCol: org.apache.spark.sql.Column) = ev
      .select(col("k"), tsCol.as("ts"))
      .groupBy(col("k"), session_window(col("ts"), "10 seconds"))
      .agg(count(lit(1)).as("n"))
      .select("n").collect().map(_.getLong(0)).sorted.toSeq
    // raw microseconds: real diff 10.05 s > 10 s gap → two sessions
    assert(sessions(col("raw_ts")) === Seq(1L, 1L))
    // floored to whole seconds (q260): floored diff 10 s == gap → merge,
    // matching the q44/q255/q263 `diff > gap starts new` oracle spelling
    assert(sessions(timestamp_seconds(unix_timestamp(col("raw_ts"))))
      === Seq(2L))
  }

  test("out-of-order bridge within the watermark: a late-but-admissible " +
    "event landing BETWEEN two open sessions merges them in BOTH the " +
    "native streaming session_window and the custom sessionizer") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    def tsOf(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    // gap 60s: batch 1 opens two provisional sessions (B+0s, B+100s);
    // batch 2's B+50s event is out of order but above the watermark (3h
    // delay) and bridges them; two trailing sentinel batches (own key)
    // then advance the watermark so the bridged session seals inside a
    // DATA batch — watermarks advance between batches, so sentinel A
    // raises it and sentinel B's batch does the sealing (q252's trick).
    // B keeps every event strictly above the initial watermark of 0:
    // a row AT the watermark is filtered as late (observed on an
    // epoch-0 first event), which is a boundary artifact, not the merge
    // semantics under test.
    val B = 1000000L
    val gap = "60 seconds"
    val feed = Seq(
      Seq("a" -> (B + 0L), "a" -> (B + 100L)),
      Seq("a" -> (B + 50L)),
      Seq("zz" -> (B + 100000L)),
      Seq("zz" -> (B + 200000L)))

    // native one-liner
    val inN = MemoryStream[(String, java.sql.Timestamp)]
    val qN = inN.toDF.toDF("key", "event_time")
      .withWatermark("event_time", "3 hours")
      .groupBy(col("key"), session_window(col("event_time"), gap))
      .agg(min(unix_timestamp(col("event_time"))).as("start_epoch"),
        max(unix_timestamp(col("event_time"))).as("end_epoch"),
        count(lit(1)).as("n_events"))
      .select("key", "start_epoch", "end_epoch", "n_events")
      .writeStream.format("memory").queryName("sw_native")
      .outputMode("append").start()
    // custom exact state machine (0s watermark delay on the same feed —
    // every arrival here is above even that watermark)
    val inC = MemoryStream[(String, java.sql.Timestamp)]
    val qC = StreamingAnalytics.sessionizeStream(
        inC.toDF.toDF("key", "event_time")
          .as[StreamingAnalytics.SEvent], gapSeconds = 60L,
        watermark = "3 hours")
      .toDF()
      .writeStream.format("memory").queryName("sw_custom")
      .outputMode("append").start()
    try {
      feed.foreach { batch =>
        inN.addData(batch.map { case (k, t) => (k, tsOf(t)) }: _*)
        qN.processAllAvailable()
        inC.addData(batch.map { case (k, t) => (k, tsOf(t)) }: _*)
        qC.processAllAvailable()
      }
      def read(tbl: String) = spark.table(tbl)
        .where(col("key") === "a")
        .select("start_epoch", "end_epoch", "n_events")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sortBy(_._1).toSeq
      val native = read("sw_native")
      val custom = read("sw_custom")
      // the bridge happened: ONE session B..B+100 with all 3 events
      assert(custom === Seq((B, B + 100L, 3L)))
      assert(native === custom)
    } finally { qN.stop(); qC.stop() }
  }

  test("the transformWithState sessionizer (ListState + event-time " +
    "timers, RocksDB) handles the same out-of-order bridge exactly — " +
    "q263's machine agrees with q255's") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    def tsOf(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val B = 1000000L
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val saved = spark.conf.getOption(provKey)
    spark.conf.set(provKey, "org.apache.spark.sql.execution.streaming" +
      ".state.RocksDBStateStoreProvider")
    val in = MemoryStream[(String, java.sql.Timestamp)]
    val q = StreamingAnalytics.sessionizeStreamTws(
        in.toDF.toDF("key", "event_time")
          .as[StreamingAnalytics.SEvent], gapSeconds = 60L,
        watermark = "3 hours")
      .toDF()
      .writeStream.format("memory").queryName("sw_tws")
      .outputMode("append").start()
    try {
      Seq(
        Seq("a" -> (B + 0L), "a" -> (B + 100L)),
        Seq("a" -> (B + 50L)),          // bridges the two open sessions
        Seq("zz" -> (B + 100000L)),     // sentinel A raises the watermark
        Seq("zz" -> (B + 200000L))      // sentinel B's batch seals 'a'
      ).foreach { batch =>
        in.addData(batch.map { case (k, t) => (k, tsOf(t)) }: _*)
        q.processAllAvailable()
      }
      val got = spark.table("sw_tws").where(col("key") === "a")
        .select("start_epoch", "end_epoch", "n_events")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sortBy(_._1).toSeq
      assert(got === Seq((B, B + 100L, 3L)))
    } finally {
      q.stop()
      saved.fold(spark.conf.unset(provKey))(spark.conf.set(provKey, _))
    }
  }
}
