package graft.gtfs

import java.nio.file.{Files, Paths}

import graft.SparkSpec
import graft.streaming.RealtimeStream
import org.apache.spark.sql.streaming.Trigger

/** The composed cron topology: fetch cycles land payloads in the drop
  * directory; the feed stream consumes them into the keyed snapshot. */
class FetchLoopSpec extends SparkSpec {

  private def feedBytes(arr: Long): Array[Byte] =
    Rt.encode(FeedMessage(
      FeedHeader("2.0", Some(arr)),
      Seq(FeedEntity("e", None, Some(TripUpdate(
        TripDescriptor(Some("T1"), None, Some("20240601"), None),
        Seq(StopTimeUpdate(Some(1),
          Some(StopTimeEvent(None, Some(arr), None)), None, Some("10"))),
        None, None))))))

  test("two fetch cycles through the drop dir update the snapshot " +
    "(second prediction wins)") {
    val base = Paths.get("target", "test_fetchloop")
    org.apache.commons.io.FileUtils.deleteQuietly(base.toFile)
    val upstream = base.resolve("upstream.pb")
    Files.createDirectories(base)
    val drop = base.resolve("drop").toString
    val tgt = base.resolve("tgt").toString
    val chk = base.resolve("chk").toString

    // "The agency's server": a file: URL whose content changes between
    // cycles. Each cron minute = one fetch cycle + one stream tick (a
    // single key's updates land in separate micro-batches, as in
    // production; within one batch feed order would be ambiguous).
    def streamRound(): Unit = {
      val q = RealtimeStream.startFeedStream(spark, drop, tgt, chk,
        weatherJson = () => None, trigger = Trigger.AvailableNow())
      q.awaitTermination()
    }
    var stamp = 0L
    val clock = () => { stamp += 1; stamp }
    Files.write(upstream, feedBytes(1000L))
    val landed1 = FetchLoop.run(upstream.toUri.toString, drop,
      cycles = 1, intervalMillis = 0L, clock = clock)
    assert(landed1.size === 1 && landed1.forall(p =>
      Files.exists(p) && p.toString.endsWith(".pb")))
    streamRound()

    Files.write(upstream, feedBytes(2000L))
    assert(FetchLoop.run(upstream.toUri.toString, drop,
      cycles = 1, intervalMillis = 0L, clock = clock).size === 1)
    streamRound()

    val snap = spark.read.parquet(tgt).collect()
    assert(snap.length === 1) // one key — latest prediction won
    val arrEpoch = snap.head.getTimestamp(
      snap.head.fieldIndex("arrival_time")).getTime / 1000
    assert(arrEpoch === 2000L)
  }
}
