package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph primitives beyond [[PageRank]]: exact triangle
  * counting and bounded-depth BFS levels. Both are spelled as pure
  * relational plans — joins plus hash-aggregates on integer keys — so
  * they hash-match a SQL oracle exactly and scale as ordinary shuffles
  * (no driver-side graph, no vertex program framework).
  *
  * Triangle counting uses the degree-ordered wedge algorithm (Cohen,
  * "Graph Twiddling in a MapReduce World", 2009; Suri & Vassilvitskii,
  * WWW'11): orient every undirected edge from its lower-(degree, id)
  * endpoint to the higher one, build wedges by self-joining the oriented
  * list on the shared LOW vertex, and close each wedge against the
  * undirected edge set. Orientation makes each triangle discoverable
  * exactly once and bounds the wedge fanout by Σ d⁺(v)² where d⁺ is the
  * ORIENTED out-degree ≤ O(√m) on any graph — the difference between a
  * web-scale join and a star-node blowup. Everything is integer
  * (degrees, ids, counts), so the same plan in any engine produces the
  * same rows.
  *
  * BFS runs the textbook iterative frontier expansion under a depth
  * CEILING: up to `maxDepth` equi-joins of the (slim) frontier against
  * the edge list, keeping the first (= minimum) level at which each node
  * is reached, stopping early once a frontier comes back empty. Every
  * round localCheckpoints both the frontier and the visited set (the
  * q51 connected-components discipline), so lineage and analysis cost
  * stay O(1) per round at ANY depth instead of nesting one
  * join+distinct+anti-join deeper per level; levels are small integers,
  * exact everywhere.
  */
object Graph {

  /** Canonical undirected edge list: (a, b) with a < b, self-loops
    * dropped, parallel edges collapsed. Input may list either or both
    * directions. */
  def undirected(edges: DataFrame, srcCol: String, dstCol: String): DataFrame =
    edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .where(col("a") < col("b"))
      .distinct()

  /** Per-node triangle participation counts over the undirected graph
    * defined by `edges` (any direction; deduplicated internally).
    * Returns (node, n_triangles) for every node in ≥1 triangle. Each
    * triangle contributes once to each of its three corners. */
  def triangleCounts(edges: DataFrame, srcCol: String,
                     dstCol: String): DataFrame = {
    val und = undirected(edges, srcCol, dstCol)
    // degree over the undirected graph — the orientation key
    val deg = und.select(col("a").as("node"))
      .union(und.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    // orient low-(deg, id) → high-(deg, id); ties cannot happen on the
    // composite because ids are distinct within an edge
    val withDeg = und
      .join(deg.withColumnRenamed("node", "a")
        .withColumnRenamed("deg", "da"), "a")
      .join(deg.withColumnRenamed("node", "b")
        .withColumnRenamed("deg", "db"), "b")
    val oriented = withDeg.select(
      when(col("da") < col("db") ||
        (col("da") === col("db") && col("a") < col("b")), col("a"))
        .otherwise(col("b")).as("lo"),
      when(col("da") < col("db") ||
        (col("da") === col("db") && col("a") < col("b")), col("b"))
        .otherwise(col("a")).as("hi"))
    // wedges centered at the LOW vertex; u < v orders the two arms so
    // each unordered wedge appears once
    val wedges = oriented.as("e1").join(oriented.as("e2"),
        col("e1.lo") === col("e2.lo") && col("e1.hi") < col("e2.hi"))
      .select(col("e1.lo").as("x"), col("e1.hi").as("u"),
        col("e2.hi").as("v"))
    // close the wedge against the undirected edge set ((u,v) is already
    // canonical: u < v by construction)
    val tri = wedges.join(und,
      wedges("u") === und("a") && wedges("v") === und("b"))
    tri.select(explode(array(col("x"), col("u"), col("v"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_triangles"))
  }

  /** Minimum BFS level (hop distance) from `source` for every node
    * reachable within `maxDepth` hops over the undirected graph defined
    * by `edges`. Returns (node, level) with level 0 for the source. */
  def bfsLevels(edges: DataFrame, srcCol: String, dstCol: String,
                source: Long, maxDepth: Int): DataFrame = {
    require(maxDepth >= 1, "maxDepth >= 1")
    val und = undirected(edges, srcCol, dstCol)
    // symmetric adjacency for traversal
    val adj = und.select(col("a").as("s"), col("b").as("d"))
      .union(und.select(col("b").as("s"), col("a").as("d")))
    val spark = edges.sparkSession
    import spark.implicits._
    // Release a superseded round's localCheckpoint blocks eagerly (the
    // other half of the q51 discipline): Dataset.unpersist does not
    // touch localCheckpoint blocks — they are an RDD-level persist —
    // so the underlying LogicalRDD must be unpersisted directly, or
    // every round's full visited snapshot stays pinned in executor
    // block storage until RDD GC: O(depth · |visited|) on the deep
    // traversals this truncation exists to enable. A no-op for the
    // non-checkpointed seed frame.
    def release(df: DataFrame): Unit = {
      org.apache.spark.sql.graftbridge.Bridge.localCheckpointRdd(df)
        .foreach(_.unpersist(blocking = false))
      df.unpersist(blocking = false)
    }
    var visited = Seq((source, 0)).toDF("node", "level")
    var frontier = visited
    var depth = 0
    while (depth < maxDepth && !frontier.isEmpty) {
      depth += 1
      // expand the CURRENT frontier only (classic BFS: nodes reached at
      // depth-1 cannot discover anything new), drop already-visited
      val next = frontier.join(adj, col("node") === col("s"))
        .select(col("d").as("node")).distinct()
        .join(visited.select("node"), Seq("node"), "left_anti")
        .withColumn("level", lit(depth))
        // truncate lineage EVERY round (the q51 connected-components
        // checkpoint discipline): each iteration otherwise nests one
        // join + distinct + anti-join deeper into both `next` and the
        // growing `visited` union, and the plan grows superlinearly
        // with maxDepth — re-analysis cost and lineage-recompute risk,
        // not data volume, become the bound on traversal depth
        .localCheckpoint(eager = true)
      val newVisited = visited.unionByName(next)
        .localCheckpoint(eager = true)
      // both frames of the NEW round are materialized self-contained;
      // the old round's blocks are never read again
      release(frontier)
      if (visited ne frontier) release(visited)
      visited = newVisited
      frontier = next
    }
    // the final frontier's rows live on inside the returned visited
    // snapshot (its union was materialized eagerly); only the visited
    // blocks must outlive this call
    if (frontier ne visited) release(frontier)
    // the frontier-empty early exit above also stops at the graph's
    // true eccentricity: maxDepth is a CEILING, not a forced round count
    visited
  }
}
