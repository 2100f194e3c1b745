package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Fixed-point PageRank semantics against an independent in-memory
  * integer reference implementing the identical recurrence. */
class PageRankSpec extends SparkSpec {

  private def referenceRanks(edges: Seq[(Long, Long, Long)],
                             iters: Int): Map[Long, Long] = {
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val n = nodes.size.toLong
    val r0 = PageRank.Scale / n
    val base = (15L * r0) / 100L
    val wtot = edges.groupBy(_._1).map { case (s, es) => s -> es.map(_._3).sum }
    var r = nodes.map(_ -> r0).toMap
    for (_ <- 1 to iters) {
      val sums = edges.groupBy(_._2).map { case (d, es) =>
        d -> es.map { case (s, _, w) => (r(s) * w) / wtot(s) }.sum
      }
      r = nodes.map(v => v -> (base + (85L * sums.getOrElse(v, 0L)) / 100L)).toMap
    }
    r
  }

  test("fixedPoint matches the integer reference on a graph with a sink, " +
    "a source, weighted multi-edges, and a cycle") {
    import spark.implicits._
    // 1→2 (w2), 1→3, 2→3, 3→1 (cycle); 4→3 (source node); 3 is heavily
    // pointed-to; 5 appears only as a destination (no out-edges: sink)
    val edges = Seq((1L, 2L, 2L), (1L, 3L, 1L), (2L, 3L, 1L),
      (3L, 1L, 3L), (4L, 3L, 1L), (2L, 5L, 1L))
    val got = PageRank.fixedPoint(
        edges.toDF("src", "dst", "weight"), "src", "dst", "weight", iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === referenceRanks(edges, 3))
  }

  test("ranks are positive, total mass never exceeds Scale (truncation " +
    "only loses mass), and the double readout is exactly fp/Scale") {
    import spark.implicits._
    val edges = Seq((1L, 2L, 1L), (2L, 1L, 1L), (1L, 3L, 1L), (2L, 3L, 1L),
      (3L, 1L, 1L))
    val df = edges.toDF("src", "dst", "weight")
    val out = PageRank.fixedPoint(df, "src", "dst", "weight", iters = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.forall(_._2 > 0L))
    assert(out.map(_._2).sum <= PageRank.Scale)
    // the double readout is exactly fp / 1e12
    out.foreach { case (_, fp, d) =>
      assert(d === fp.toDouble / PageRank.Scale.toDouble)
    }
  }
}
