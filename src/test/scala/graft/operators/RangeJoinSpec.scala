package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bucketized range join vs the naive inequality join, plus the plan
  * contract (equi-join, no nested loop). */
class RangeJoinSpec extends SparkSpec {

  test("pointInInterval equals the naive BETWEEN join: boundary-crossing " +
    "intervals, inclusive endpoints, empty (lo>hi) intervals, negative " +
    "times, nested and overlapping intervals") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val points = (1 to 400).map(i =>
      (s"k${rnd.nextInt(4)}", rnd.nextInt(200).toLong - 100L, i.toLong))
      .toDF("k", "t", "pid")
    val intervals = (1 to 120).map { i =>
      val lo = rnd.nextInt(220).toLong - 110L
      // mix: proper intervals of varied width, zero-length, and inverted
      val hi = rnd.nextInt(3) match {
        case 0 => lo + rnd.nextInt(40)
        case 1 => lo            // zero-length: matches exactly t == lo
        case _ => lo - 5        // inverted: matches nothing
      }
      (s"k${rnd.nextInt(5)}", lo, hi, i.toLong)
    }.toDF("k", "lo", "hi", "iid")
    val got = RangeJoin
      .pointInInterval(points, intervals, Seq("k"), "t", "lo", "hi",
        bucketWidth = 16L)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1)))
      .sorted.toSeq
    val want = points.join(intervals, Seq("k"))
      .where(col("t") >= col("lo") && col("t") <= col("hi"))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1)))
      .sorted.toSeq
    assert(got.nonEmpty && got === want)
    // no duplicate pairs: each point joins its interval in exactly one bucket
    assert(got.distinct.size === got.size)
  }

  test("pointInInterval plans an EQUI-join on (key, bucket) — no " +
    "BroadcastNestedLoopJoin, no CartesianProduct") {
    import spark.implicits._
    val points = Seq(("a", 1L, 1L)).toDF("k", "t", "pid")
    val intervals = Seq(("a", 0L, 2L, 1L)).toDF("k", "lo", "hi", "iid")
    val plan = RangeJoin
      .pointInInterval(points, intervals, Seq("k"), "t", "lo", "hi", 10L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"range join degenerated to a product join:\n$plan")
  }
}
