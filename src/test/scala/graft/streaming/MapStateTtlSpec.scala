package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{TTLConfig, Trigger}

/** State TTL on [[StreamingAnalytics.dimAggStream]]'s MapState (q265's
  * machine): the bounded-state guarantee where no watermark applies.
  * Pins BOTH directions — accumulation within the TTL, and the
  * production claim itself: a dimension idle past the TTL is EVICTED by
  * the store (it stops appearing in snapshots) and RE-ADMITS from zero
  * on its next event, rather than resuming its pre-eviction totals.
  *
  * Driving note: TTL requires TimeMode.ProcessingTime, and in that mode
  * the operator reports shouldRunAnotherBatch unconditionally — so
  * `processAllAvailable` NEVER settles (the engine always has another
  * no-data batch to run). The test therefore polls the memory sink for
  * each batch's emissions instead, with a paced trigger so the no-data
  * batches idle at ~4/s rather than busy-looping. */
class MapStateTtlSpec extends SparkSpec {

  test("a dimension idle past the TTL evicts and re-admits from zero; " +
    "within the TTL it accumulates; an untouched dimension disappears " +
    "from snapshots once expired") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val saved = spark.conf.getOption(provKey)
    spark.conf.set(provKey, "org.apache.spark.sql.execution.streaming" +
      ".state.RocksDBStateStoreProvider")
    val in = MemoryStream[StreamingAnalytics.DEvent]
    val q = StreamingAnalytics.dimAggStream(in.toDS(),
        TTLConfig(java.time.Duration.ofSeconds(12)))
      .toDF()
      .writeStream.format("memory").queryName("ms_ttl")
      .trigger(Trigger.ProcessingTime("250 milliseconds"))
      .outputMode("append").start()
    try {
      // addData, then poll for the batch's snapshot rows (expectedNew of
      // them) — no-data batches emit nothing, so new rows always mean
      // the data batch committed
      def snapAfter(expectedNew: Int, events: StreamingAnalytics.DEvent*)
          : Map[String, (Long, Long)] = {
        val before = spark.table("ms_ttl").count()
        in.addData(events: _*)
        val deadline = System.nanoTime() + 60L * 1000000000L
        while (spark.table("ms_ttl").count() < before + expectedNew) {
          q.exception.foreach(throw _)
          assert(System.nanoTime() < deadline, "timed out awaiting batch")
          Thread.sleep(100L)
        }
        // settle a few trigger periods, then pin the EXACT count — an
        // eviction failure would emit MORE rows than expected (the
        // expired dimension's snapshot), which a >=-poll alone can miss
        Thread.sleep(1000L)
        val all = spark.table("ms_ttl").collect()
        assert(all.length === before.toInt + expectedNew)
        all.drop(before.toInt)
          .map(r => r.getAs[String]("event_type") ->
            ((r.getAs[Long]("n_so_far"), r.getAs[Long]("vu_sum"))))
          .toMap
      }
      // warm-up batch under a throwaway key: the FIRST RocksDB batch
      // pays provider spin-up + whole-pipeline codegen (observed ~25 s
      // in the test JVM) — wall time that must not count against the
      // TTL clock of the choreography below (post-warmup batches run in
      // well under a second)
      snapAfter(1, StreamingAnalytics.DEvent(99L, 1L, "warm", 0L)): Unit
      // batch 1: two clicks and a view open key 1's profile
      val s1 = snapAfter(2,
        StreamingAnalytics.DEvent(1L, 100L, "click", 5L),
        StreamingAnalytics.DEvent(1L, 101L, "click", 7L),
        StreamingAnalytics.DEvent(1L, 102L, "view", 3L))
      assert(s1 === Map("click" -> ((2L, 12L)), "view" -> ((1L, 3L))))
      // batch 2, immediately (within the 12 s TTL): click accumulates
      // and the untouched view still snapshots — nothing has expired
      val s2 = snapAfter(2, StreamingAnalytics.DEvent(1L, 200L, "click", 1L))
      assert(s2 === Map("click" -> ((3L, 13L)), "view" -> ((1L, 3L))))
      // idle past the TTL: both entries' expirations pass
      Thread.sleep(14000L)
      // batch 3: click RE-ADMITS from zero (not 4/15), and view — never
      // refreshed — is gone from the snapshot entirely
      val s3 = snapAfter(1, StreamingAnalytics.DEvent(1L, 300L, "click", 2L))
      assert(s3 === Map("click" -> ((1L, 2L))))
    } finally {
      q.stop()
      saved.fold(spark.conf.unset(provKey))(spark.conf.set(provKey, _))
    }
  }
}
