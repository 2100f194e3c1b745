package graft.pipelines

import graft.SparkSpec
import graft.gtfs._
import org.apache.spark.sql.DataFrame

/** E1 composition: protobuf feed → sentinel/weather/stamp → keyed merge. */
class RealtimeSpec extends SparkSpec {

  private val weather =
    """{"weather":[{"id":601,"main":"Snow","description":"heavy snow"}],
      |"main":{"temp":263.15,"humidity":90}}""".stripMargin.replace("\n", "")

  private def feed(stus: (Int, String, Option[Long], Option[Long])*): Array[Byte] =
    Rt.encode(FeedMessage(FeedHeader("2.0", Some(1717200000L)),
      Seq(FeedEntity("e", None, Some(TripUpdate(
        TripDescriptor(Some("T1"), None, Some("20240601"), None),
        stus.map { case (seq, stop, arr, dep) =>
          StopTimeUpdate(Some(seq),
            arr.map(t => StopTimeEvent(None, Some(t), None)),
            dep.map(t => StopTimeEvent(None, Some(t), None)), Some(stop))
        }, None, None))))))

  private def run(bytes: Seq[Array[Byte]], wx: Option[String],
                  tgt: Option[DataFrame]): DataFrame = {
    implicit val s = spark
    import s.implicits._
    Realtime.microBatch(spark.createDataset(bytes), wx, tgt)
  }

  test("first batch: sentinel defaults, weather attach, run stamp, last-entity-wins") {
    val b = feed(
      (1, "10", Some(1717203600L), None),  // no departure → sentinel
      (1, "10", Some(1717203700L), None),  // repeated key → this one wins
      (2, "11", None, Some(1717204000L)))
    val out = run(Seq(b), Some(weather), None)
    val rows = out.collect().map(r => (r.getLong(2),
      Option(r.getTimestamp(4)).map(_.getTime / 1000),
      Option(r.getTimestamp(5)).map(_.getTime / 1000),
      r.getString(6), r.getDouble(8))).sortBy(_._1)
    assert(rows.length === 2)
    assert(rows(0) === (1L, Some(1717203700L), Some(0L), "Snow", -10.0))
    assert(rows(1)._3 === Some(1717204000L))
    assert(rows(1)._2 === Some(0L)) // missing arrival → epoch-0 sentinel
    // one run stamp across all rows
    assert(out.select("created_at").distinct().count() === 1L)
  }

  test("second batch merges: changed prediction updates, created_at preserved") {
    val b1 = feed((1, "10", Some(100L), Some(200L)))
    val snap1 = run(Seq(b1), None, None)
    assert(snap1.select("weather_group").head().isNullAt(0)) // throttled run
    val b2 = feed(
      (1, "10", Some(150L), Some(200L)), // changed arrival
      (2, "11", Some(300L), None))       // new key
    val snap2 = run(Seq(b2), Some(weather), Some(snap1))
    val byKey = snap2.collect().map(r => r.getLong(2) ->
      (Option(r.getTimestamp(4)).map(_.getTime / 1000).get,
        r.getTimestamp(9), r.getTimestamp(10))).toMap
    assert(byKey(1L)._1 === 150L)            // updated prediction
    assert(byKey(1L)._2 !== byKey(1L)._3)    // created (batch1) != updated (batch2)
    assert(byKey(2L)._1 === 300L)            // inserted
  }
}
