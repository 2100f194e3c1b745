package graft.operators

import graft.SparkSpec

/** Gap rule, per-key isolation, and deterministic equal-timestamp ties. */
class SessionizeSpec extends SparkSpec {

  test("sessions split on gap > threshold, per key, ties broken by id") {
    import spark.implicits._
    val ev = Seq(
      (1L, 10L, 0L),     // u1 s1
      (1L, 11L, 100L),   // u1 s1 (gap 100)
      (1L, 12L, 2000L),  // u1 s2 (gap 1900 > 1800)
      (1L, 13L, 2000L),  // u1 s2 (equal ts — same session, id tiebreak)
      (1L, 14L, 4000L),  // u1 s3 (gap 2000)
      (2L, 20L, 50L))    // u2 s1 (keys isolated)
      .toDF("user_id", "event_id", "ts_epoch")
    val got = Sessionize
      .assignSessions(ev, Seq("user_id"), "ts_epoch", "event_id", 1800L)
      .collect().map(r => r.getLong(1) -> r.getLong(3)).toMap
    assert(got === Map(10L -> 1L, 11L -> 1L, 12L -> 2L, 13L -> 2L,
      14L -> 3L, 20L -> 1L))
  }
}
