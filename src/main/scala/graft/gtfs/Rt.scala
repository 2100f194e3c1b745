package graft.gtfs

import org.apache.spark.sql.{Dataset, SparkSession}

/** GTFS-realtime FeedMessage subset (S2, SURVEY.md §2.1) — the fields the
  * reference consumes (reference/scripts/realtime_extractor.py:97-118;
  * schema reference/lib/gtfs_realtime_pb2.py:16, which is the public
  * gtfs-realtime.proto). Field numbers follow that public spec:
  *
  *   FeedMessage     { header=1, entity=2* }
  *   FeedHeader      { gtfs_realtime_version=1, timestamp=3 }
  *   FeedEntity      { id=1, is_deleted=2, trip_update=3 }
  *   TripUpdate      { trip=1, stop_time_update=2*, timestamp=4, delay=5 }
  *   TripDescriptor  { trip_id=1, start_time=2, start_date=3, route_id=5 }
  *   StopTimeUpdate  { stop_sequence=1, arrival=2, departure=3, stop_id=4 }
  *   StopTimeEvent   { delay=1, time=2, uncertainty=3 }
  *
  * Scalars are Options because proto2 optional presence is semantic here:
  * a missing arrival/departure means "no prediction" (the reference maps it
  * to NULL / the epoch-0 sentinel, realtime_extractor.py:109-116).
  */
case class StopTimeEvent(delay: Option[Int], time: Option[Long],
                         uncertainty: Option[Int])
case class StopTimeUpdate(stopSequence: Option[Int],
                          arrival: Option[StopTimeEvent],
                          departure: Option[StopTimeEvent],
                          stopId: Option[String])
case class TripDescriptor(tripId: Option[String], startTime: Option[String],
                          startDate: Option[String], routeId: Option[String])
case class TripUpdate(trip: TripDescriptor,
                      stopTimeUpdate: Seq[StopTimeUpdate],
                      timestamp: Option[Long], delay: Option[Int])
case class FeedHeader(gtfsRealtimeVersion: String, timestamp: Option[Long])
case class FeedEntity(id: String, isDeleted: Option[Boolean],
                      tripUpdate: Option[TripUpdate])
case class FeedMessage(header: FeedHeader, entity: Seq[FeedEntity])

/** One flattened realtime observation — one row per stop_time_update, the
  * reference's `parse_pb_data` output shape (realtime_extractor.py:97-118).
  * Epochs are nullable: absent arrival/departure = no prediction. */
case class RtRow(trip_id: String, start_date: String, stop_sequence: Long,
                 stop_id: String, arrival_epoch: Option[Long],
                 departure_epoch: Option[Long])

/** Minimal protobuf wire-format codec (varints + length-delimited fields —
  * the public encoding, developers.google.com/protocol-buffers/docs/encoding).
  * Zero dependencies: the sandbox ships no protobuf runtime, and the subset
  * above needs only wire types 0 and 2. Unknown fields are skipped on
  * decode, so real-world feeds with vehicle/alert entities parse fine. */
object Pb {
  final class Writer {
    private val out = new java.io.ByteArrayOutputStream()
    def varint(v: Long): Unit = {
      var x = v
      while ((x & ~0x7FL) != 0) { out.write(((x & 0x7FL) | 0x80L).toInt); x >>>= 7 }
      out.write(x.toInt)
    }
    private def tag(field: Int, wire: Int): Unit = varint((field.toLong << 3) | wire)
    def int64(field: Int, v: Long): Unit = { tag(field, 0); varint(v) }
    def bool(field: Int, v: Boolean): Unit = int64(field, if (v) 1L else 0L)
    def str(field: Int, s: String): Unit = {
      tag(field, 2)
      val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      varint(b.length.toLong); out.write(b, 0, b.length)
    }
    def msg(field: Int, body: Array[Byte]): Unit = {
      tag(field, 2); varint(body.length.toLong); out.write(body, 0, body.length)
    }
    def bytes: Array[Byte] = out.toByteArray
  }

  /** Bounds-checked reader: a truncated or corrupt payload (partial HTTP
    * body, bit rot) must fail with a clear parse error at the violation,
    * never index past the buffer or silently consume a sibling field's
    * bytes through an unterminated varint. */
  final class Reader(buf: Array[Byte], start: Int, val end: Int) {
    var pos: Int = start
    def hasNext: Boolean = pos < end
    private def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"malformed protobuf at $pos: $msg")
    def varint(): Long = {
      var shift = 0; var res = 0L; var b = 0
      do {
        if (pos >= end) fail("truncated varint")
        if (shift >= 64) fail("varint exceeds 10 bytes")
        b = buf(pos) & 0xFF; pos += 1
        res |= (b & 0x7FL) << shift; shift += 7
      } while ((b & 0x80) != 0)
      res
    }
    private def lenPrefixed(): Int = {
      val len = varint()
      // compare against the REMAINING span, not `pos + len > end`: a
      // hostile length varint near Long.MaxValue would overflow that sum
      // to a negative, slip past the check, and surface as a raw
      // StringIndexOutOfBounds from len.toInt truncation instead of a
      // parse error
      if (len < 0 || len > (end - pos).toLong)
        fail(s"declared length $len overruns field")
      len.toInt
    }
    /** Returns (fieldNumber, wireType). */
    def readTag(): (Int, Int) = { val t = varint().toInt; (t >>> 3, t & 7) }
    def skip(wire: Int): Unit = wire match {
      case 0 => varint()
      case 1 => if (pos + 8 > end) fail("truncated fixed64") else pos += 8
      case 2 =>
        // two steps: `pos += lenPrefixed()` would read pos BEFORE the
        // call advances it past the length varint
        val len = lenPrefixed(); pos += len
      case 5 => if (pos + 4 > end) fail("truncated fixed32") else pos += 4
      case w => fail(s"unsupported wire type $w")
    }
    /** Sub-reader over one length-delimited field. */
    def sub(): Reader = {
      val len = lenPrefixed()
      val r = new Reader(buf, pos, pos + len)
      pos += len
      r
    }
    def strValue(): String = {
      val len = lenPrefixed()
      val s = new String(buf, pos, len, java.nio.charset.StandardCharsets.UTF_8)
      pos += len
      s
    }
  }
}

/** S1/S2 — GTFS-realtime feed ingestion: fetch, decode, flatten. */
object Rt {

  // ------------------------------------------------------------- encode --
  // (for tests and synthetic-feed generation; a transit agency's server is
  // the producer in production)

  private def encodeEvent(e: StopTimeEvent): Array[Byte] = {
    val w = new Pb.Writer
    e.delay.foreach(d => w.int64(1, d.toLong))
    e.time.foreach(t => w.int64(2, t))
    e.uncertainty.foreach(u => w.int64(3, u.toLong))
    w.bytes
  }

  private def encodeStu(s: StopTimeUpdate): Array[Byte] = {
    val w = new Pb.Writer
    s.stopSequence.foreach(q => w.int64(1, q.toLong))
    s.arrival.foreach(a => w.msg(2, encodeEvent(a)))
    s.departure.foreach(d => w.msg(3, encodeEvent(d)))
    s.stopId.foreach(i => w.str(4, i))
    w.bytes
  }

  private def encodeTrip(t: TripDescriptor): Array[Byte] = {
    val w = new Pb.Writer
    t.tripId.foreach(w.str(1, _))
    t.startTime.foreach(w.str(2, _))
    t.startDate.foreach(w.str(3, _))
    t.routeId.foreach(w.str(5, _))
    w.bytes
  }

  private def encodeTu(t: TripUpdate): Array[Byte] = {
    val w = new Pb.Writer
    w.msg(1, encodeTrip(t.trip))
    t.stopTimeUpdate.foreach(s => w.msg(2, encodeStu(s)))
    t.timestamp.foreach(w.int64(4, _))
    t.delay.foreach(d => w.int64(5, d.toLong))
    w.bytes
  }

  def encode(m: FeedMessage): Array[Byte] = {
    val w = new Pb.Writer
    val h = new Pb.Writer
    h.str(1, m.header.gtfsRealtimeVersion)
    m.header.timestamp.foreach(h.int64(3, _))
    w.msg(1, h.bytes)
    m.entity.foreach { e =>
      val ew = new Pb.Writer
      ew.str(1, e.id)
      e.isDeleted.foreach(ew.bool(2, _))
      e.tripUpdate.foreach(t => ew.msg(3, encodeTu(t)))
      w.msg(2, ew.bytes)
    }
    w.bytes
  }

  // ------------------------------------------------------------- decode --

  private def decodeEvent(r: Pb.Reader): StopTimeEvent = {
    var delay: Option[Int] = None; var time: Option[Long] = None
    var unc: Option[Int] = None
    while (r.hasNext) r.readTag() match {
      case (1, 0) => delay = Some(r.varint().toInt)
      case (2, 0) => time = Some(r.varint())
      case (3, 0) => unc = Some(r.varint().toInt)
      case (_, w) => r.skip(w)
    }
    StopTimeEvent(delay, time, unc)
  }

  private def decodeStu(r: Pb.Reader): StopTimeUpdate = {
    var seq: Option[Int] = None; var arr: Option[StopTimeEvent] = None
    var dep: Option[StopTimeEvent] = None; var sid: Option[String] = None
    while (r.hasNext) r.readTag() match {
      case (1, 0) => seq = Some(r.varint().toInt)
      case (2, 2) => arr = Some(decodeEvent(r.sub()))
      case (3, 2) => dep = Some(decodeEvent(r.sub()))
      case (4, 2) => sid = Some(r.strValue())
      case (_, w) => r.skip(w)
    }
    StopTimeUpdate(seq, arr, dep, sid)
  }

  private def decodeTrip(r: Pb.Reader): TripDescriptor = {
    var tid: Option[String] = None; var st: Option[String] = None
    var sd: Option[String] = None; var rid: Option[String] = None
    while (r.hasNext) r.readTag() match {
      case (1, 2) => tid = Some(r.strValue())
      case (2, 2) => st = Some(r.strValue())
      case (3, 2) => sd = Some(r.strValue())
      case (5, 2) => rid = Some(r.strValue())
      case (_, w) => r.skip(w)
    }
    TripDescriptor(tid, st, sd, rid)
  }

  private def decodeTu(r: Pb.Reader): TripUpdate = {
    var trip = TripDescriptor(None, None, None, None)
    val stus = Seq.newBuilder[StopTimeUpdate]
    var ts: Option[Long] = None; var delay: Option[Int] = None
    while (r.hasNext) r.readTag() match {
      case (1, 2) => trip = decodeTrip(r.sub())
      case (2, 2) => stus += decodeStu(r.sub())
      case (4, 0) => ts = Some(r.varint())
      case (5, 0) => delay = Some(r.varint().toInt)
      case (_, w) => r.skip(w)
    }
    TripUpdate(trip, stus.result(), ts, delay)
  }

  private def decodeHeader(r: Pb.Reader): FeedHeader = {
    var v = ""; var ts: Option[Long] = None
    while (r.hasNext) r.readTag() match {
      case (1, 2) => v = r.strValue()
      case (3, 0) => ts = Some(r.varint())
      case (_, w) => r.skip(w)
    }
    FeedHeader(v, ts)
  }

  /** bytes → FeedMessage (the `FeedMessage.ParseFromString` analog). */
  def decode(bytes: Array[Byte]): FeedMessage = {
    val r = new Pb.Reader(bytes, 0, bytes.length)
    var header = FeedHeader("", None)
    val entities = Seq.newBuilder[FeedEntity]
    while (r.hasNext) r.readTag() match {
      case (1, 2) => header = decodeHeader(r.sub())
      case (2, 2) =>
        val er = r.sub()
        var id = ""; var del: Option[Boolean] = None
        var tu: Option[TripUpdate] = None
        while (er.hasNext) er.readTag() match {
          case (1, 2) => id = er.strValue()
          case (3, 2) => tu = Some(decodeTu(er.sub()))
          case (2, 0) => del = Some(er.varint() != 0L)
          case (_, w) => er.skip(w)
        }
        entities += FeedEntity(id, del, tu)
      case (_, w) => r.skip(w)
    }
    FeedMessage(header, entities.result())
  }

  // ------------------------------------------------------------ flatten --

  /** Per-message flatten: one RtRow per stop_time_update of each entity
    * carrying a trip_update (reference realtime_extractor.py:97-118).
    * Absent arrival/departure times surface as None — the caller decides
    * between NULL and the epoch-0 sentinel (P6 semantics). */
  def flatten(m: FeedMessage): Seq[RtRow] =
    for {
      e <- m.entity
      tu <- e.tripUpdate.toSeq
      stu <- tu.stopTimeUpdate
    } yield RtRow(
      trip_id = tu.trip.tripId.getOrElse(""),
      start_date = tu.trip.startDate.getOrElse(""),
      stop_sequence = stu.stopSequence.getOrElse(0).toLong,
      stop_id = stu.stopId.getOrElse(""),
      arrival_epoch = stu.arrival.flatMap(_.time),
      departure_epoch = stu.departure.flatMap(_.time))

  /** S2 as a distributed operator: decode + flatten a Dataset of raw feed
    * payloads. A typed flatMap (the Generator shape) — per-partition, no
    * shuffle; the imperative wire decode is exactly the "genuine
    * per-partition logic" case where typed functions beat Column exprs. */
  def decodeFlatten(feeds: Dataset[Array[Byte]])
                   (implicit s: SparkSession): Dataset[RtRow] = {
    import s.implicits._
    feeds.flatMap(b => flatten(decode(b)))
  }

  // -------------------------------------------------------------- fetch --

  /** S1 — feed fetch with the reference's 503 tolerance
    * (realtime_extractor.py:155-170): None on HTTP 503 ("try again next
    * minute"), payload otherwise; non-503 failures propagate. Connect and
    * request are BOUNDED by `timeoutMillis`: a server that accepts the
    * connection and never responds must fail this cron tick, not hang the
    * process past the next one (the run-level O2 timeout cannot interrupt
    * driver-side I/O — the bound has to live on the socket). Driver-side
    * by design — ingestion edge, not a relational op. Supports file: URLs
    * (tests) via URL.openStream. */
  def fetch(url: String, timeoutMillis: Long = 30000L): Option[Array[Byte]] = {
    val u = java.net.URI.create(url)
    if (u.getScheme == "http" || u.getScheme == "https") {
      val client = java.net.http.HttpClient.newBuilder()
        .connectTimeout(java.time.Duration.ofMillis(timeoutMillis))
        .build()
      val resp = client.send(
        java.net.http.HttpRequest.newBuilder(u)
          .timeout(java.time.Duration.ofMillis(timeoutMillis))
          .GET().build(),
        java.net.http.HttpResponse.BodyHandlers.ofByteArray())
      if (resp.statusCode() == 503) None
      else if (resp.statusCode() / 100 == 2) Some(resp.body())
      else throw new java.io.IOException(s"HTTP ${resp.statusCode()} for $url")
    } else {
      val in = u.toURL.openStream()
      try Some(in.readAllBytes()) finally in.close()
    }
  }
}
