package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row

/** As-of join semantics vs a naive per-row reference: backward/forward,
  * equal-time ties, unmatched lefts, NULL right payloads. */
class AsOfJoinSpec extends SparkSpec {

  // left: (k, t, lv) — k2 has no right rows; k3's right payload is NULL
  private lazy val left = {
    import spark.implicits._
    Seq(("k1", 5L, "c"), ("k1", 10L, "a"), ("k1", 20L, "b"),
      ("k2", 10L, "d"), ("k3", 10L, "e")).toDF("k", "lt", "lv")
  }
  private lazy val right = {
    import spark.implicits._
    Seq(("k1", 3L, Some(3.0)), ("k1", 10L, Some(1.0)), ("k1", 15L, Some(2.0)),
      ("k3", 8L, None)).toDF("k", "rt", "rv")
  }

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map { r: Row =>
      (r.getString(0), r.getLong(1), r.getString(2),
        Option(r.get(3)).map(_.asInstanceOf[Double]),
        Option(r.get(4)).map(_.asInstanceOf[Long]))
    }.sortBy(t => (t._1, t._2)).toSeq

  test("backward asOf: latest at-or-before per key; equal-time tie " +
    "matches; unmatched lefts survive with NULLs; a NULL right payload " +
    "still matches atomically (no older value substituted)") {
    val got = rows(AsOfJoin.asOf(left, right, Seq("k"), "lt", "rt"))
    assert(got === Seq(
      ("k1", 5L, "c", Some(3.0), Some(3L)),   // latest rt <= 5 is 3
      ("k1", 10L, "a", Some(1.0), Some(10L)), // tie at 10 matches
      ("k1", 20L, "b", Some(2.0), Some(15L)),
      ("k2", 10L, "d", None, None),           // no right rows for k2
      ("k3", 10L, "e", None, Some(8L))))      // matched, payload IS null
  }

  test("forward asOf: earliest at-or-after per key") {
    val got = rows(AsOfJoin.asOf(left, right, Seq("k"), "lt", "rt",
      forward = true))
    assert(got === Seq(
      ("k1", 5L, "c", Some(1.0), Some(10L)),  // earliest rt >= 5 is 10
      ("k1", 10L, "a", Some(1.0), Some(10L)), // tie at 10 matches
      ("k1", 20L, "b", None, None),           // nothing after 20
      ("k2", 10L, "d", None, None),
      ("k3", 10L, "e", None, None)))          // k3's only right is at 8
  }

  test("NULL time columns: a NULL-time right row never matches anything, " +
    "a NULL-time left row survives with a NULL match, both directions") {
    import spark.implicits._
    val l = Seq(("k1", Some(5L), "x"), ("k1", Option.empty[Long], "y"))
      .toDF("k", "lt", "lv")
    val r = Seq(("k1", Option.empty[Long], Some(9.0)),
      ("k1", Some(3L), Some(1.0))).toDF("k", "rt", "rv")
    for (fwd <- Seq(false, true)) {
      val got = AsOfJoin.asOf(l, r, Seq("k"), "lt", "rt", forward = fwd)
        .collect().map { row =>
          row.getString(2) -> (Option(row.get(3)), Option(row.get(4)))
        }.toMap
      // the NULL-lt left row matches nothing in either direction
      assert(got("y") === ((None, None)), s"forward=$fwd: $got")
      if (!fwd) // lt=5 matches rt=3, never the NULL-rt row's 9.0
        assert(got("x") === (Some(1.0), Some(3L)), s"backward: $got")
      else // nothing at-or-after 5
        assert(got("x") === (None, None), s"forward: $got")
    }
  }

  test("asOf matches a naive reference on a randomized dense timeline") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val ls = (1 to 300).map(i =>
      (s"k${rnd.nextInt(5)}", rnd.nextInt(100).toLong, i.toLong))
    val rs = (1 to 200).map(i =>
      (s"k${rnd.nextInt(6)}", rnd.nextInt(100).toLong, i.toDouble))
      // deterministic: unique right rows per (key, time)
      .groupBy(t => (t._1, t._2)).map { case ((k, t), g) =>
        (k, t, g.map(_._3).max) }.toSeq
    val want = ls.map { case (k, lt, id) =>
      val cand = rs.filter(r => r._1 == k && r._2 <= lt)
      val best = if (cand.isEmpty) None else Some(cand.maxBy(_._2))
      (k, lt, id, best.map(_._3), best.map(_._2))
    }.sortBy(t => (t._1, t._2, t._3))
    val got = AsOfJoin.asOf(
      ls.toDF("k", "lt", "id"), rs.toDF("k", "rt", "rv"),
      Seq("k"), "lt", "rt")
      .collect().map { r: Row =>
        (r.getString(0), r.getLong(1), r.getLong(2),
          Option(r.get(3)).map(_.asInstanceOf[Double]),
          Option(r.get(4)).map(_.asInstanceOf[Long]))
      }.sortBy(t => (t._1, t._2, t._3)).toSeq
    assert(got === want)
  }

  test("asOf is one shuffle: a single Exchange on the join key feeds the " +
    "window sweep — no join operator, no replication") {
    val plan = AsOfJoin.asOf(left, right, Seq("k"), "lt", "rt")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"asOf must not plan a join:\n$plan")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges === 1, s"expected exactly one shuffle:\n$plan")
  }
}
