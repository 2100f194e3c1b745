package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type-2 history build — turning an append-only
  * change log into validity intervals is the warehouse-side dual of
  * [[Upsert]]: where upsert keeps only the latest attribute value per key,
  * SCD2 keeps EVERY value with the half-open interval [valid_from,
  * valid_to) during which it held, so any past state of the dimension can
  * be reconstructed with a point-in-time predicate.
  *
  * Two stacked windows over the same (key hash-partition, (ts, tie) sort):
  * the first lag-detects rows where any tracked attribute actually changed
  * (null-safe, so NULL→value and value→NULL are changes while NULL→NULL is
  * not), the second lead-closes each surviving row's interval at the next
  * change. Because the change filter preserves the first window's
  * partitioning and ordering, Catalyst plans the second window WITHOUT a
  * new Exchange or Sort — the whole operator is a single shuffle of the
  * slim (key, attrs, ts, tie) projection, never a self-join.
  *
  * At 100 TB the shuffle is keyed by the dimension's natural key
  * (high-cardinality), so partitions stay balanced; per-key state is the
  * key's own change history, which for real dimensions is short. */
object Scd2 {

  /** Collapse a change log to SCD2 intervals. `tsCol` must be epoch
    * seconds (long); `tieCol` breaks equal-ts ordering deterministically.
    * Emits one row per value-run of `attrCols` per key: the key columns,
    * the attribute columns, `valid_from` (first ts of the run),
    * `valid_to` (ts of the next change, NULL while current) and a
    * 1-based `version` ordinal per key. */
  def buildHistory(df: DataFrame, keyCols: Seq[String],
                   attrCols: Seq[String], tsCol: String,
                   tieCol: String): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol).asc, col(tieCol).asc)
    val changed = attrCols
      .map(a => !(lag(col(a), 1).over(w) <=> col(a)))
      .reduce(_ || _)
    // row_number()==1 marks the key's first event, which always opens an
    // interval even when every tracked attribute is NULL
    val first = row_number().over(w) === 1
    df.withColumn("__chg", first || changed)
      .where(col("__chg"))
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("version", row_number().over(w).cast("long"))
      .select((keyCols ++ attrCols).map(col) :+ col("valid_from") :+
        col("valid_to") :+ col("version"): _*)
  }
}
