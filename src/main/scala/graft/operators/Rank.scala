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
  *  1. range-repartition on the sort key (Spark samples split bounds;
  *     partition i holds keys <= partition i+1's — a distributed sort's
  *     first half);
  *  2. rank WITHIN each partition (parallel windows over
  *     `spark_partition_id`), count rows per partition (a tiny
  *     #partitions-row aggregate), prefix-sum those counts into offsets
  *     (single-task, but over #partitions rows of metadata — the same
  *     bounded-driver-state budget as IVF centroids), and broadcast-join
  *     the offsets back: global rank = partition offset + local rank.
  *
  * The result depends only on the key's TOTAL order, not on where the
  * sampled bounds land — callers must make the key total (append a
  * unique tiebreak) or equal-key ranks are partition-placement-defined.
  *
  * The motivating use is the deterministic corpus shuffle: rank by a
  * seeded content hash and the training order is reproducible from the
  * seed alone, with no RNG state and no single-reducer sort. */
object Rank {

  /** Append `rankCol` (1-based BIGINT) ranking rows by `sortCols`
    * lexicographically. `sortCols` must induce a total order. */
  def globalRank(df: DataFrame, sortCols: Seq[Column],
                 rankCol: String = "rank"): DataFrame = {
    require(sortCols.nonEmpty, "globalRank requires at least one sort key")
    val ranged = df.repartitionByRange(sortCols: _*)
      .withColumn("__pid", spark_partition_id())
    val local = ranged.withColumn("__lr",
      row_number().over(
        Window.partitionBy(col("__pid")).orderBy(sortCols: _*)).cast("long"))
    // #partitions rows of metadata: count per partition, prefix-sum into
    // the partition's starting offset
    val offsets = ranged.groupBy("__pid").agg(count(lit(1)).as("__n"))
      .withColumn("__off",
        coalesce(sum(col("__n")).over(
          Window.orderBy(col("__pid"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__pid"), col("__off"))
    local.join(broadcast(offsets), "__pid")
      .withColumn(rankCol, col("__lr") + col("__off"))
      .drop("__pid", "__lr")
  }
}
