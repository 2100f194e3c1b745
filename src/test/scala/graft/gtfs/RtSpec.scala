package graft.gtfs

import graft.SparkSpec

/** S2 wire-codec round trip + flatten semantics. */
class RtSpec extends SparkSpec {

  private val feed = FeedMessage(
    header = FeedHeader("2.0", Some(1717200000L)),
    entity = Seq(
      FeedEntity("e1", None, Some(TripUpdate(
        trip = TripDescriptor(Some("T1"), Some("08:00:00"),
          Some("20240601"), Some("R1")),
        stopTimeUpdate = Seq(
          StopTimeUpdate(Some(1), Some(StopTimeEvent(Some(60), Some(1717203600L), None)),
            Some(StopTimeEvent(None, Some(1717203660L), None)), Some("10")),
          StopTimeUpdate(Some(2), None, // no arrival prediction
            Some(StopTimeEvent(None, Some(1717204000L), None)), Some("11"))),
        timestamp = Some(1717200100L), delay = None))),
      FeedEntity("e2", Some(false), None))) // entity without trip_update

  test("encode/decode round trip is exact") {
    assert(Rt.decode(Rt.encode(feed)) === feed)
  }

  test("decoder skips unknown fields (forward compatibility)") {
    // Append an unknown varint field (#15) and an unknown length-delimited
    // field (#14) at the FeedMessage level — a real feed with
    // vehicle/alert data must still parse.
    val w = new Pb.Writer
    w.int64(15, 42L)
    w.str(14, "future")
    val extra = Rt.encode(feed) ++ w.bytes
    assert(Rt.decode(extra) === feed)
  }

  test("varints round-trip across the 1/2/5/10-byte boundaries") {
    for (v <- Seq(0L, 1L, 127L, 128L, 300L, 16383L, 16384L,
        Int.MaxValue.toLong, Long.MaxValue, -1L)) {
      val w = new Pb.Writer; w.varint(v)
      val r = new Pb.Reader(w.bytes, 0, w.bytes.length)
      assert(r.varint() === v, s"v=$v")
    }
  }

  test("flatten: one row per stop_time_update, absent events -> None") {
    val rows = Rt.flatten(feed)
    assert(rows === Seq(
      RtRow("T1", "20240601", 1L, "10", Some(1717203600L), Some(1717203660L)),
      RtRow("T1", "20240601", 2L, "11", None, Some(1717204000L))))
  }

  test("decodeFlatten distributes over a Dataset of payloads") {
    import spark.implicits._
    implicit val s = spark
    val ds = spark.createDataset(Seq(Rt.encode(feed), Rt.encode(feed)))
    val out = Rt.decodeFlatten(ds).collect()
    assert(out.length === 4)
    assert(out.count(_.arrival_epoch.isEmpty) === 2)
  }

  test("truncated and corrupt payloads fail with a clear parse error, " +
    "never an index crash or silent mis-parse") {
    val good = Rt.encode(feed)
    // truncation at every prefix length: always a clean parse error (or a
    // successful parse of a prefix that happens to end on a field boundary)
    (0 until good.length).foreach { n =>
      try Rt.decode(good.take(n))
      catch {
        case e: IllegalArgumentException =>
          assert(e.getMessage.contains("malformed protobuf"), e.getMessage)
      }
    }
    // a length-delimited field whose declared length overruns the buffer
    val lied = good.clone()
    // find the first length-delimited tag (field 1 = header, wire 2) and
    // corrupt its length byte to an overrun
    assert((lied(0) & 7) === 2)
    lied(1) = 0x7f.toByte
    val ex = intercept[IllegalArgumentException](Rt.decode(lied))
    assert(ex.getMessage.contains("malformed protobuf"))
  }

  test("fetch reads file: URLs (the test stand-in for the HTTP path)") {
    val dir = java.nio.file.Paths.get("target", "test_rt")
    java.nio.file.Files.createDirectories(dir)
    val p = java.nio.file.Files.createTempFile(dir, "feed", ".pb")
    try {
      java.nio.file.Files.write(p, Rt.encode(feed))
      val got = Rt.fetch(p.toUri.toString)
      assert(got.map(_.toSeq) === Some(Rt.encode(feed).toSeq))
    } finally java.nio.file.Files.delete(p)
  }
}
