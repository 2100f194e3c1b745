package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-point integer PageRank — the iterative-join graph centrality
  * operator, spelled so every iteration is EXACTLY reproducible across
  * engines (Page, Brin, Motwani, Winograd, "The PageRank Citation
  * Ranking", 1999 — reimplemented from the published recurrence).
  *
  * The determinism trick: ranks are BIGINT micro-units of 1e-12 (one
  * "rank" = `SCALE` units) and every step is integer arithmetic —
  * per-edge contribution `(r·w) DIV wtot`, exact BIGINT sums, damping
  * `(85·s) DIV 100`. Floating-point PageRank sums per-edge doubles in
  * shuffle arrival order, which is run-dependent; fixed-point sums are
  * associative-exact, so the result hashes identically on Spark and the
  * DuckDB oracle at every iteration count. The ~1e-12 truncation per
  * step is far below any ranking-relevant signal, and mass lost to
  * truncation/dangling nodes only shrinks scores uniformly (this is the
  * standard simplified recurrence that ignores dangling redistribution).
  *
  * Scale shape: each iteration is one equi-join of slim (node, rank)
  * against edges plus one map-side-combined hash-agg — the canonical
  * 1000-executor iterative-join pattern. Iteration count is FIXED (a
  * convergence-tolerance loop would need a driver action per round; at
  * 3–10 iterations the unrolled lineage is shallow enough to skip
  * checkpointing the RANKS). The INPUT frames, however, are
  * localCheckpoint-pinned before the loop: `edges`, `nodes` and the
  * out-weight table each appear once per iteration in the unrolled
  * plan, and Spark does no cross-join common-subexpression elimination
  * — without the pin, a caller handing in a derived edge frame (q134's
  * edges are an events self-join) pays that subtree ~2 times per
  * iteration plus thrice up front (measured at sf0.1: q134 5.7 s → 1.9 s
  * min-of-4 from this pin alone, guide §1.2 step 1 / §5 lineage
  * truncation). Node/edge frames shuffle on their own keys; nothing is
  * collected to the driver.
  *
  * `edges` must have columns (src, dst, weight: BIGINT, weight > 0).
  * Returns (node, pr_fp: BIGINT fixed-point, pagerank: DOUBLE) for every
  * node appearing as a source or destination. */
object PageRank {

  val Scale = 1000000000000L // 1e12: rank 1.0 in micro-units

  def fixedPoint(edges: DataFrame, srcCol: String, dstCol: String,
                 weightCol: String, iters: Int): DataFrame = {
    require(iters >= 1, "at least one iteration")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"),
      col(weightCol).cast("long").as("w"))
      .localCheckpoint(eager = false)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .localCheckpoint(eager = false)
    val outw = e.groupBy("src").agg(sum(col("w")).as("wtot"))
      .localCheckpoint(eager = false)
    // one-row scalars, broadcast — never collected to the driver
    val consts = nodes.agg(count(lit(1)).as("__n"))
      .selectExpr(s"$Scale DIV __n AS __r0",
        s"(15 * ($Scale DIV __n)) DIV 100 AS __base")
    var ranks = nodes.crossJoin(broadcast(consts))
      .select(col("node"), col("__r0").as("r"))
    for (_ <- 1 to iters) {
      val sums = e.join(ranks.withColumnRenamed("node", "src"), "src")
        .join(outw, "src")
        .selectExpr("dst", "(r * w) DIV wtot AS c")
        .groupBy("dst").agg(sum(col("c")).as("s"))
      ranks = nodes
        .join(sums.withColumnRenamed("dst", "node"), Seq("node"), "left")
        .crossJoin(broadcast(consts))
        .selectExpr("node", "__base + (85 * coalesce(s, 0)) DIV 100 AS r")
    }
    ranks.select(col("node"), col("r").as("pr_fp"),
      (col("r").cast("double") / lit(Scale).cast("double")).as("pagerank"))
  }
}
