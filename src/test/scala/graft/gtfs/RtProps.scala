package graft.gtfs

import org.scalacheck.{Arbitrary, Gen, Properties}
import org.scalacheck.Prop.forAll

/** ScalaCheck properties for the protobuf wire codec: arbitrary
  * FeedMessages round-trip exactly, and varints survive the full Long
  * range (SURVEY.md §5 item 3 — property tests). Pure JVM, no Spark. */
object RtProps extends Properties("Rt") {

  private val genStr: Gen[String] =
    Gen.chooseNum(0, 12).flatMap(n => Gen.stringOfN(n, Gen.alphaNumChar))

  private val genEvent: Gen[StopTimeEvent] = for {
    d <- Gen.option(Gen.chooseNum(-3600, 3600))
    t <- Gen.option(Gen.chooseNum(0L, 4102444800L))
    u <- Gen.option(Gen.chooseNum(0, 600))
  } yield StopTimeEvent(d, t, u)

  private val genStu: Gen[StopTimeUpdate] = for {
    seq <- Gen.option(Gen.chooseNum(0, 500))
    arr <- Gen.option(genEvent)
    dep <- Gen.option(genEvent)
    sid <- Gen.option(genStr)
  } yield StopTimeUpdate(seq, arr, dep, sid)

  private val genTrip: Gen[TripDescriptor] = for {
    tid <- Gen.option(genStr); st <- Gen.option(genStr)
    sd <- Gen.option(genStr); rid <- Gen.option(genStr)
  } yield TripDescriptor(tid, st, sd, rid)

  private val genTu: Gen[TripUpdate] = for {
    trip <- genTrip
    stus <- Gen.listOfN(3, genStu).flatMap(l =>
      Gen.chooseNum(0, 3).map(l.take))
    ts <- Gen.option(Gen.chooseNum(0L, 4102444800L))
    d <- Gen.option(Gen.chooseNum(-600, 600))
  } yield TripUpdate(trip, stus, ts, d)

  private val genFeed: Gen[FeedMessage] = for {
    v <- genStr
    hts <- Gen.option(Gen.chooseNum(0L, 4102444800L))
    n <- Gen.chooseNum(0, 4)
    ents <- Gen.listOfN(n, for {
      id <- genStr
      del <- Gen.option(Arbitrary.arbBool.arbitrary)
      tu <- Gen.option(genTu)
    } yield FeedEntity(id, del, tu))
  } yield FeedMessage(FeedHeader(v, hts), ents)

  property("encode/decode round trip") = forAll(genFeed) { m =>
    Rt.decode(Rt.encode(m)) == m
  }

  property("varint round trip over the full Long range") =
    forAll { (v: Long) =>
      val w = new Pb.Writer; w.varint(v)
      new Pb.Reader(w.bytes, 0, w.bytes.length).varint() == v
    }

  property("flatten row count = stop_time_updates across trip entities") =
    forAll(genFeed) { m =>
      Rt.flatten(m).size ==
        m.entity.flatMap(_.tripUpdate).map(_.stopTimeUpdate.size).sum
    }
}
