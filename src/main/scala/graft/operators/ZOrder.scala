package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) layout: interleave the bits of k quantized columns
  * into one sort key, so rows close in EVERY dimension land close in the
  * one-dimensional sort — and a multi-dimensional box predicate prunes
  * parquet row groups / files by their min-max stats, where a
  * single-column sort only prunes on that column. The standard
  * data-layout move that turns "scan 100 TB, filter to a 2-D box" into
  * reading the handful of files whose z-range intersects the box.
  *
  * [[zValue]] is a pure Column expression (a fixed fold of shifts and
  * ors — whole-stage-codegen'd, exactly mirrorable in SQL);
  * [[zorderedWrite]] is the layout pass itself: range-partition by z,
  * sort within partitions, write — producing files with DISJOINT z
  * ranges (range partitioning assigns by key comparison), which is the
  * property min-max skipping needs. */
object ZOrder {

  /** Morton-interleave `cols` (each already quantized to a NON-NEGATIVE
    * integer < 2^bits — clamp upstream) into one long: output bit
    * (i*k + j) is bit i of cols(j). k*bits must stay in a long's
    * non-sign bits. */
  def zValue(cols: Seq[Column], bits: Int): Column = {
    val k = cols.size
    require(k >= 1, "zValue requires at least one column")
    require(bits >= 1 && bits * k <= 63,
      s"bits*cols must fit in 63 bits, got $bits*$k")
    val terms = for {
      i <- 0 until bits
      j <- 0 until k
    } yield shiftleft(
      shiftrightunsigned(cols(j).cast("long"), i).bitwiseAND(lit(1L)),
      i * k + j)
    terms.reduce(_.bitwiseOR(_))
  }

  /** Write `df` z-ordered by `z` to parquet at `path`: files carry
    * pairwise-disjoint z ranges (ZOrderSpec reads the footprint back and
    * proves it), so engines prune on footer min-max stats. */
  def zorderedWrite(df: DataFrame, z: Column, path: String): Unit = {
    require(!df.columns.contains("__z"),
      "input already has a __z column — rename it before zorderedWrite")
    df.withColumn("__z", z)
      .repartitionByRange(col("__z"))
      .sortWithinPartitions(col("__z"))
      // the helper column must not leak into the written schema; a
      // projection preserves the partition-local sort
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }
}
