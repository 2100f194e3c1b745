package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization — the batch formulation every event pipeline
  * needs (grouping clicks, observations, or training-data interactions
  * into visits): a new session starts when the gap to the key's previous
  * event exceeds `gapSeconds`; the session ordinal is the running count
  * of session starts.
  *
  * Scale: one hash partition by key + one in-partition sort feeds BOTH
  * window functions (lag and the running sum share the frame), so the
  * whole operator is a single shuffle of slim columns — the classic
  * two-window trick that avoids a self-join. Ordering includes the
  * tiebreak column so equal timestamps sessionize deterministically. */
object Sessionize {

  /** Append `session_seq` (1-based per-key session ordinal) to `df`.
    * `tsCol` must be epoch seconds (long); `tieCol` breaks equal-ts
    * ordering deterministically. */
  def assignSessions(df: DataFrame, keyCols: Seq[String], tsCol: String,
                     tieCol: String, gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol).asc, col(tieCol).asc)
    val prev = lag(col(tsCol), 1).over(w)
    val isStart = when(prev.isNull || col(tsCol) - prev > gapSeconds, 1L)
      .otherwise(0L)
    df.withColumn("session_seq",
      sum(isStart).over(w.rowsBetween(Window.unboundedPreceding,
        Window.currentRow)))
  }
}
