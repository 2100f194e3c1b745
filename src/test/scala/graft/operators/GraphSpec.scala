package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins Graph.triangleCounts and Graph.bfsLevels on a hand-computed
  * graph: K4 (every vertex in 3 triangles) plus a pendant path that
  * contributes no triangles but extends BFS depth.
  *
  * Graph: 1-2-3-4 complete; 4-5, 5-6 path.
  *   Triangles: {1,2,3},{1,2,4},{1,3,4},{2,3,4} → each of 1..4 in 3.
  *   BFS from 1: 1@0; 2,3,4@1; 5@2; 6@3.
  */
class GraphSpec extends SparkSpec {

  private def edges = {
    val s = spark
    import s.implicits._
    // listed in mixed direction with a duplicate and a self-loop: the
    // canonicalizer must absorb all three
    Seq((1L, 2L), (2L, 1L), (3L, 1L), (1L, 4L), (2L, 3L), (4L, 2L),
      (3L, 4L), (4L, 5L), (5L, 6L), (6L, 6L))
      .toDF("src", "dst")
  }

  test("triangleCounts finds each K4 corner in 3 triangles, path nodes in none") {
    val got = Graph.triangleCounts(edges, "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("bfsLevels reports minimum hop distance, bounded by maxDepth") {
    val got = Graph.bfsLevels(edges, "src", "dst", source = 1L, maxDepth = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // depth 2 reaches 5 but not 6
    assert(got === Map(1L -> 0, 2L -> 1, 3L -> 1, 4L -> 1, 5L -> 2))
    val deep = Graph.bfsLevels(edges, "src", "dst", source = 1L, maxDepth = 4)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(deep === Map(1L -> 0, 2L -> 1, 3L -> 1, 4L -> 1, 5L -> 2, 6L -> 3))
  }

  test("undirected canonicalizes direction, duplicates and self-loops") {
    val und = Graph.undirected(edges, "src", "dst")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(und === Set((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L), (5L, 6L)))
  }
}
