package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D Pareto frontier (skyline, Börzsönyi/Kossmann/Stocker, "The skyline
  * operator", ICDE 2001) under max-max semantics: a row is ON the
  * frontier iff no other row is ≥ in BOTH dimensions and > in at least
  * one. The data-curation use: "no document both longer AND
  * higher-quality exists" — the non-dominated set is the natural
  * candidate pool when two desiderata cannot be collapsed into one
  * score. Duplicate (x, y) points do not dominate each other: every copy
  * of a frontier point is returned.
  *
  * Three-stage plan, each stage provably lossless and bounded:
  *
  *  1. collapse to per-x maxima — a map-side-combined hash aggregate:
  *     any row below its own x-group's max y is dominated (same x,
  *     bigger y), so the frontier only ever contains (x, max y) points;
  *     the working set drops from corpus-sized to distinct-x-sized;
  *  2. local prune, then exact scan: within each partition, keep points
  *     whose y exceeds the running max over strictly-greater x — a
  *     globally-undominated point is undominated in its own partition
  *     (its dominators, existing nowhere, are in no partition either),
  *     so each local frontier is a SUPERSET of the global one (the
  *     [[Rank.groupTopK]] pigeonhole, with cummax for row_number); the
  *     exact global cummax scan then runs over ≤ #partitions ×
  *     local-frontier-size survivors, never the raw x domain;
  *  3. broadcast the frontier keys back over the input: one scan, no
  *     shuffle of the data — the frontier is small (it is the reason
  *     the operator exists; a frontier that rivals the corpus means the
  *     dimensions are anti-correlated and the skyline is the wrong
  *     tool, which [[frontier2D]] surfaces by the broadcast blowing up
  *     loudly rather than a silent quadratic).
  */
object Skyline {

  /** All rows of `df` on the max-max Pareto frontier of (`xCol`, `yCol`).
    * Both columns must be non-null and NaN-free (NaN has no dominance
    * order); output columns = input columns. */
  def frontier2D(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val x = col(xCol)
    val g = df.groupBy(x.as("__fx")).agg(max(col(yCol)).as("__fy"))
    val prevLocal = Window.partitionBy("__pid").orderBy(col("__fx").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = g.withColumn("__pid", spark_partition_id())
      .withColumn("__pm", max(col("__fy")).over(prevLocal))
      .where(col("__pm").isNull || col("__fy") > col("__pm"))
      .drop("__pid", "__pm")
    val prevGlobal = Window.orderBy(col("__fx").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val frontier = local
      .withColumn("__pm", max(col("__fy")).over(prevGlobal))
      .where(col("__pm").isNull || col("__fy") > col("__pm"))
      .select("__fx", "__fy")
    df.join(broadcast(frontier),
        x === col("__fx") && col(yCol) === col("__fy"))
      .drop("__fx", "__fy")
  }
}
