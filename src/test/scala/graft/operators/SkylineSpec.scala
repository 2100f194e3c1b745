package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Skyline: parity with the naive O(n²) dominance reference, duplicate
  * handling, and degenerate shapes. */
class SkylineSpec extends SparkSpec {

  import spark.implicits._

  private def naive(rows: Seq[(Long, Long, Double)]): Set[Long] =
    rows.filter { case (_, x, y) =>
      !rows.exists { case (_, x2, y2) =>
        x2 >= x && y2 >= y && (x2 > x || y2 > y)
      }
    }.map(_._1).toSet

  private def skyline(rows: Seq[(Long, Long, Double)]): Set[Long] =
    Skyline.frontier2D(rows.toDF("id", "x", "y"), "x", "y")
      .select("id").as[Long].collect().toSet

  test("matches the naive dominance reference on randomized inputs, " +
    "across partitionings") {
    val rnd = new scala.util.Random(11L)
    for (n <- Seq(1, 7, 60, 200)) {
      val rows = (1L to n.toLong).map(id =>
        (id, rnd.nextInt(20).toLong, rnd.nextInt(20).toDouble))
      val expected = naive(rows)
      assert(skyline(rows) === expected, s"n=$n")
      // same answer from a pathological single-partition layout
      val one = Skyline.frontier2D(
        rows.toDF("id", "x", "y").coalesce(1), "x", "y")
        .select("id").as[Long].collect().toSet
      assert(one === expected, s"n=$n coalesced")
    }
  }

  test("duplicate frontier points are all returned; same-x losers are not") {
    val rows = Seq(
      (1L, 10L, 5.0), (2L, 10L, 5.0), // duplicates of a frontier point
      (3L, 10L, 4.0), // same x, lower y → dominated
      (4L, 11L, 3.0), // frontier (higher x, lower y)
      (5L, 9L, 4.0)) // dominated by id 1 (both dims lower/equal, one strict)
    assert(skyline(rows) === Set(1L, 2L, 4L))
  }

  test("a totally ordered chain collapses to its single maximum") {
    val rows = (1L to 50L).map(i => (i, i, i.toDouble))
    assert(skyline(rows) === Set(50L))
  }

  test("an anti-chain (x up, y down) is entirely on the frontier") {
    val rows = (1L to 30L).map(i => (i, i, (100 - i).toDouble))
    assert(skyline(rows) === rows.map(_._1).toSet)
  }
}
