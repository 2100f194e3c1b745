package graft.streaming

import java.nio.file.{Files, Paths}

import graft.SparkSpec
import graft.gtfs._

import scala.concurrent.duration.DurationInt

/** The composed cron topology: two ticks of fetch → throttled weather →
  * E1 drain, asserting snapshot content, weather enrichment, and that the
  * throttle called the weather "API" exactly once across both ticks. */
class RealtimeRunnerSpec extends SparkSpec {

  test("two cron ticks: snapshot updates, weather attaches, throttle " +
    "holds to one weather call inside the window") {
    val base = Paths.get("target", "test_runner")
    org.apache.commons.io.FileUtils.deleteQuietly(base.toFile)
    Files.createDirectories(base)

    def feedBytes(arr: Long): Array[Byte] =
      Rt.encode(FeedMessage(
        FeedHeader("2.0", Some(arr)),
        Seq(FeedEntity("e", None, Some(TripUpdate(
          TripDescriptor(Some("T1"), None, Some("20240601"), None),
          Seq(StopTimeUpdate(Some(1),
            Some(StopTimeEvent(None, Some(arr), None)), None, Some("10"))),
          None, None))))))

    val upstream = base.resolve("upstream.pb")
    val weatherFile = base.resolve("weather.json")
    // The weather payload carries a version marker: the file is rewritten
    // to v2 between ticks, so a throttle that re-fetched inside the window
    // would surface v2 — the snapshot must show v1 in both ticks.
    Files.writeString(weatherFile,
      """{"weather":[{"id":601,"main":"Snow","description":"v1"}],""" +
        """"main":{"temp":263.15}}""")

    val cfg = RealtimeRunner.Config(
      feedUrl = upstream.toUri.toString,
      dropDir = base.resolve("drop").toString,
      targetPath = base.resolve("tgt").toString,
      checkpointDir = base.resolve("chk").toString,
      weatherUrl = Some(weatherFile.toUri.toString),
      weatherStatePath = base.resolve("weather.state").toString,
      weatherMinInterval = 2.minutes,
      runTimeout = 5.minutes)

    var now = 0L
    val clock = () => { now += 1000L; now } // each call +1s: inside window

    Files.write(upstream, feedBytes(1000L))
    assert(RealtimeRunner.runOnce(spark, cfg, clock) === 1)

    // Between ticks the upstream weather CHANGES; the throttle must keep
    // serving the cached v1 payload (window not elapsed).
    Files.writeString(weatherFile,
      """{"weather":[{"id":601,"main":"Snow","description":"v2"}],""" +
        """"main":{"temp":263.15}}""")
    Files.write(upstream, feedBytes(2000L))
    assert(RealtimeRunner.runOnce(spark, cfg, clock) === 1)

    val snap = spark.read.parquet(cfg.targetPath).collect()
    assert(snap.length === 1)
    val row = snap.head
    assert(row.getTimestamp(row.fieldIndex("arrival_time")).getTime / 1000
      === 2000L) // second tick's prediction won
    assert(row.getString(row.fieldIndex("weather_description")) === "v1",
      "throttle leaked a second weather call inside the window")
    // and the throttle state file exists for the next process
    assert(Files.exists(Paths.get(cfg.weatherStatePath)))
  }
}
