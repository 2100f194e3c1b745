package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global ranking — the scale-safe spelling of
  * `row_number() OVER (ORDER BY ...)`. The built-in global window is a
  * single-task operator: every row funnels through one reducer, which is
  * the first thing to die at corpus scale. This is the classic two-pass
  * alternative:
  *
  *  1. range-repartition on the sort key and sort within partitions
  *     (a distributed sort: partition i's keys all precede partition
  *     i+1's), then stamp `monotonically_increasing_id` — whose
  *     documented layout is (partitionId << 33) | rowIndexInPartition,
  *     so partition id AND the local sort position ride one long with
  *     NO window operator and no second shuffle of the data;
  *  2. count rows per partition (a tiny #partitions-row aggregate),
  *     prefix-sum those counts into per-partition starting offsets
  *     (single-task, but over #partitions rows of metadata — the same
  *     bounded-driver-state budget as IVF centroids), and broadcast-join
  *     them back: global rank = partition offset + local index + 1.
  *
  * The sorted pass is `localCheckpoint`'d before the fan-out: the rank
  * branch and the offsets branch must observe the SAME sampled range
  * bounds and row order, and two separate materializations of a range
  * exchange sample with different RDD-derived seeds — relying on
  * exchange reuse to merge them would make correctness hostage to a
  * plan-canonicalization detail. Call [[release]] when done with a
  * result to drop the pinned blocks eagerly.
  *
  * The result depends only on the key's TOTAL order — callers must make
  * the key total (append a unique tiebreak) or equal-key ranks are
  * partition-placement-defined. Partitions must stay under 2^33 rows
  * (the id layout's row-index field).
  *
  * The motivating use is the deterministic corpus shuffle: rank by a
  * seeded content hash and the training order is reproducible from the
  * seed alone, with no RNG state and no single-reducer sort. */
object Rank {

  /** Results still reading a [[globalRank]] frame's pinned sorted pass,
    * for eager release via [[release]]. */
  private val retainedByResult = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[DataFrame, DataFrame]())

  /** Append `rankCol` (1-based BIGINT) ranking rows by `sortCols`
    * lexicographically. `sortCols` must induce a total order. */
  def globalRank(df: DataFrame, sortCols: Seq[Column],
                 rankCol: String = "rank"): DataFrame = {
    require(sortCols.nonEmpty, "globalRank requires at least one sort key")
    val sorted = df.repartitionByRange(sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .withColumn("__mid", monotonically_increasing_id())
      .localCheckpoint(eager = false)
    val mask = (1L << 33) - 1L
    val stamped = sorted
      .withColumn("__pid", shiftrightunsigned(col("__mid"), 33))
      .withColumn("__lr", col("__mid").bitwiseAND(lit(mask)) + 1L)
    // #partitions rows of metadata: count per partition, prefix-sum into
    // the partition's starting offset
    val offsets = stamped.groupBy("__pid").agg(count(lit(1)).as("__n"))
      .withColumn("__off",
        coalesce(sum(col("__n")).over(
          Window.orderBy(col("__pid"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__pid"), col("__off"))
    val out = stamped.join(broadcast(offsets), "__pid")
      .withColumn(rankCol, col("__lr") + col("__off"))
      .drop("__mid", "__pid", "__lr")
    retainedByResult.put(out, sorted)
    out
  }

  /** Distributed global PREFIX SUM — the scale-safe spelling of
    * `sum(v) OVER (ORDER BY key ROWS UNBOUNDED PRECEDING)`. The naive
    * unpartitioned cumulative window funnels every row through ONE task
    * — fine over a provably bounded frame, a scale-killer over any
    * frame that grows with the data (a distinct-value grid of a
    * continuous column, a per-user row set). Same two-pass shape as
    * [[globalRank]]:
    *
    *  1. range-repartition on the sort key, sort within partitions, and
    *     stamp `monotonically_increasing_id` (partition id and local
    *     position in one long — see [[globalRank]]); `localCheckpoint`
    *     the pass so every branch observes the same sampled range
    *     bounds;
    *  2. local INCLUSIVE running sums per value column inside each
    *     range partition (the window partitions by `__pid`, so no
    *     partition outgrows a task's input), while a tiny
    *     #partitions-row aggregate computes each partition's column
    *     totals; prefix-summing THOSE (an unpartitioned window over
    *     metadata, the bounded-driver-state budget globalRank already
    *     spends) gives per-partition starting offsets, broadcast-joined
    *     back: global running sum = partition offset + local running
    *     sum.
    *
    * `valueCols` maps input column → emitted inclusive-cumulative
    * column; use integral/decimal columns (float fold order is
    * placement-defined). `sortCols` must induce a total order for the
    * per-row cumulative values to be well-defined (a grid keyed by the
    * sort column qualifies); value columns must be non-null. Call
    * [[release]] on the result when done. */
  def globalPrefixSum(df: DataFrame, sortCols: Seq[Column],
                      valueCols: Seq[(String, String)]): DataFrame = {
    require(sortCols.nonEmpty, "globalPrefixSum requires a sort key")
    require(valueCols.nonEmpty, "globalPrefixSum requires value columns")
    val sorted = df.repartitionByRange(sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .withColumn("__mid", monotonically_increasing_id())
      .localCheckpoint(eager = false)
    val stamped = sorted
      .withColumn("__pid", shiftrightunsigned(col("__mid"), 33))
    val wLocal = Window.partitionBy("__pid").orderBy("__mid")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val localCum = valueCols.foldLeft(stamped) { case (d, (in, out)) =>
      d.withColumn(out, sum(col(in)).over(wLocal))
    }
    val totals = stamped.groupBy("__pid")
      .agg(sum(col(valueCols.head._1)).as(s"__t_${valueCols.head._2}"),
        valueCols.tail.map { case (in, out) =>
          sum(col(in)).as(s"__t_$out") }: _*)
    val wOff = Window.orderBy("__pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = valueCols.foldLeft(totals) { case (d, (_, out)) =>
      d.withColumn(s"__o_$out",
        coalesce(sum(col(s"__t_$out")).over(wOff),
          col(s"__t_$out") * lit(0L)))
    }.select(col("__pid") +:
      valueCols.map { case (_, out) => col(s"__o_$out") }: _*)
    val withOff = localCum.join(broadcast(offsets), "__pid")
    val out = valueCols.foldLeft(withOff) { case (d, (_, o)) =>
      d.withColumn(o, col(o) + col(s"__o_$o"))
    }.drop("__mid" +: "__pid" +:
      valueCols.map { case (_, o) => s"__o_$o" }: _*)
    retainedByResult.put(out, sorted)
    out
  }

  /** Drop the sorted-pass blocks a [[globalRank]] result pins. The
    * result must not be evaluated again afterwards. */
  def release(result: DataFrame): Unit = {
    val sorted = retainedByResult.remove(result)
    if (sorted != null)
      org.apache.spark.sql.graftbridge.Bridge.localCheckpointRdd(sorted)
        .foreach(_.unpersist(blocking = false))
  }

  /** Per-group top-k with bounded window partitions — the scale-safe
    * spelling of `row_number() OVER (PARTITION BY group ORDER BY …) <= k`
    * when the group column is BOUNDED-cardinality (lang, source, day
    * type): the naive window puts one group's entire corpus slice in a
    * single task. Two bounded passes instead:
    *
    *  1. local prune: rank within (group, input-partition) and keep ≤ k
    *     per cell — any row with global in-group rank j ≤ k has at most
    *     j−1 better same-group rows in its OWN partition (pigeonhole,
    *     valid for ANY partition assignment), so the local top-k is
    *     always a superset of the global top-k; window partitions are
    *     bounded by task input;
    *  2. exact rank over the ≤ k × #partitions survivors — bounded.
    *
    * `sortCols` must induce a total order within each group (append a
    * unique tiebreak) or equal-key ranks are placement-defined. Emits
    * the input columns + `rankCol` (1-based BIGINT, ≤ k). */
  def groupTopK(df: DataFrame, groupCols: Seq[String], sortCols: Seq[Column],
                k: Int, rankCol: String = "rank"): DataFrame = {
    require(k > 0, "k must be positive")
    require(groupCols.nonEmpty, "groupTopK requires group columns; use " +
      "globalRank + a limit for the ungrouped shape")
    val wLocal = Window
      .partitionBy((groupCols.map(col) :+ col("__pid")): _*)
      .orderBy(sortCols: _*)
    val wExact = Window.partitionBy(groupCols.map(col): _*).orderBy(sortCols: _*)
    df.withColumn("__pid", spark_partition_id())
      .withColumn("__lr", row_number().over(wLocal))
      .where(col("__lr") <= k).drop("__pid", "__lr")
      .withColumn(rankCol, row_number().over(wExact).cast("long"))
      .where(col(rankCol) <= k)
  }
}
