package graft.operators

import graft.SparkSpec

/** SCD2 history build: run collapsing, null-safe change detection,
  * interval chaining, first-row handling, and the single-shuffle plan. */
class Scd2Spec extends SparkSpec {

  import spark.implicits._

  private def history(rows: (Long, String, Long, Long)*) =
    Scd2.buildHistory(rows.toDF("k", "attr", "ts", "tie"),
      Seq("k"), Seq("attr"), "ts", "tie")
      .collect()
      .map(r => (r.getLong(0), Option(r.getString(1)),
        r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Long]),
        r.getLong(4)))
      .toSet

  test("value runs collapse to intervals chained by valid_from/valid_to") {
    // A A B B A → three intervals, each closed at the next change
    val got = history(
      (1L, "A", 10L, 1L), (1L, "A", 20L, 2L), (1L, "B", 30L, 3L),
      (1L, "B", 40L, 4L), (1L, "A", 50L, 5L))
    assert(got === Set(
      (1L, Some("A"), 10L, Some(30L), 1L),
      (1L, Some("B"), 30L, Some(50L), 2L),
      (1L, Some("A"), 50L, None, 3L)))
  }

  test("NULL transitions are changes; NULL→NULL is a continuation") {
    val got = history(
      (1L, null, 10L, 1L), (1L, null, 20L, 2L), // first interval, NULL attr
      (1L, "A", 30L, 3L), // NULL→A is a change
      (1L, null, 40L, 4L)) // A→NULL is a change
    assert(got === Set(
      (1L, None, 10L, Some(30L), 1L),
      (1L, Some("A"), 30L, Some(40L), 2L),
      (1L, None, 40L, None, 3L)))
  }

  test("keys are independent; equal timestamps break by the tie column") {
    val got = history(
      (1L, "A", 10L, 2L), (1L, "B", 10L, 1L), // B first by tie, then A
      (2L, "C", 10L, 1L))
    assert(got === Set(
      (1L, Some("B"), 10L, Some(10L), 1L),
      (1L, Some("A"), 10L, None, 2L),
      (2L, Some("C"), 10L, None, 1L)))
  }

  test("multi-attribute tracking: a change in ANY attribute opens a row") {
    val df = Seq(
      (1L, "A", "x", 10L, 1L), (1L, "A", "y", 20L, 2L), // attr2 changes
      (1L, "A", "y", 30L, 3L) // no change → collapsed
    ).toDF("k", "a1", "a2", "ts", "tie")
    val got = Scd2.buildHistory(df, Seq("k"), Seq("a1", "a2"), "ts", "tie")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3),
        Option(r.get(4)).map(_.asInstanceOf[Long]), r.getLong(5)))
      .toSet
    assert(got === Set(
      (1L, "A", "x", 10L, Some(20L), 1L),
      (1L, "A", "y", 20L, None, 2L)))
  }

  test("point-in-time reconstruction matches latest-per-key as of that ts") {
    // the SCD2 contract: filtering valid_from <= t < valid_to recovers the
    // state the log had at t
    val rows = Seq(
      (1L, "A", 10L, 1L), (1L, "B", 30L, 2L), (2L, "C", 20L, 3L),
      (2L, "C", 40L, 4L), (2L, "D", 50L, 5L))
    val hist = Scd2.buildHistory(rows.toDF("k", "attr", "ts", "tie"),
      Seq("k"), Seq("attr"), "ts", "tie")
    val asOf35 = hist
      .where($"valid_from" <= 35L && ($"valid_to".isNull || $"valid_to" > 35L))
      .select("k", "attr").collect().map(r => (r.getLong(0), r.getString(1)))
      .toSet
    assert(asOf35 === Set((1L, "B"), (2L, "C")))
  }

  test("plan: one Exchange — the change filter keeps the first window's " +
    "partitioning so the second window adds no shuffle") {
    val df = Seq((1L, "A", 10L, 1L)).toDF("k", "attr", "ts", "tie")
    val plan = Scd2.buildHistory(df, Seq("k"), Seq("attr"), "ts", "tie")
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges === 1, s"expected a single shuffle, plan:\n$plan")
  }
}
