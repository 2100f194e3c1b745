package graft.analytics

import graft.SparkSpec

/** Funnel staging semantics through the SHARED [[Funnel.userStages]] —
  * the same expression tree the registered q93 consumes, so a staging
  * regression in the operator fails here too. The ORDER of first
  * occurrences decides the stage, not mere presence. */
class FunnelSpec extends SparkSpec {

  private def ts(day: Int, h: Int): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(f"2024-01-$day%02d $h%02d:00:00")

  test("purchase before click does not convert; order gates each stage") {
    import spark.implicits._
    val ev = Seq(
      // user 1: view -> click -> purchase, in order: stage 3
      (1L, "view", ts(1, 1)), (1L, "click", ts(1, 2)),
      (1L, "purchase", ts(1, 3)),
      // user 2: purchase BEFORE click: stage 2 (view <= click holds)
      (2L, "view", ts(1, 1)), (2L, "purchase", ts(1, 2)),
      (2L, "click", ts(1, 3)),
      // user 3: click before view: stage 1 (view present, order broken)
      (3L, "click", ts(1, 1)), (3L, "view", ts(1, 2)),
      // user 4: never viewed: stage 0
      (4L, "click", ts(1, 1)), (4L, "purchase", ts(1, 2)))
      .toDF("user_id", "event_type", "ts")
    val got = Funnel.userStages(ev, "user_id", "event_type", "ts",
        Seq("view", "click", "purchase"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 3L, 2L -> 2L, 3L -> 1L, 4L -> 0L))
  }

  test("simultaneous first occurrences count as ordered (<=, not <)") {
    import spark.implicits._
    val ev = Seq(
      (1L, "view", ts(1, 1)), (1L, "click", ts(1, 1)),
      (1L, "purchase", ts(1, 1)))
      .toDF("user_id", "event_type", "ts")
    val got = Funnel.userStages(ev, "user_id", "event_type", "ts",
        Seq("view", "click", "purchase"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 3L))
  }
}
