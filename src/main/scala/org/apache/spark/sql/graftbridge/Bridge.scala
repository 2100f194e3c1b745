package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ catalyst-Expression bridge. Spark 4's public `Column` wraps
  * api-agnostic ColumnNodes; the classic converter lives in a
  * `private[sql]` helper, so libraries adding native expressions expose it
  * through a one-file shim in the sql namespace (the established pattern
  * for Spark extension libraries). */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** The checkpointed RDD behind a `localCheckpoint`'d Dataset, if any.
    * `Dataset.unpersist` only clears CacheManager entries; a local
    * checkpoint's blocks are an RDD-LEVEL persist on the `LogicalRDD`
    * the returned Dataset wraps, so releasing them eagerly needs the
    * RDD itself. Returns None for any other plan shape (callers fall
    * back to the dataset-level unpersist). */
  def localCheckpointRdd(
      df: org.apache.spark.sql.DataFrame): Option[org.apache.spark.rdd.RDD[_]] =
    df.queryExecution.analyzed match {
      case l: org.apache.spark.sql.execution.LogicalRDD => Some(l.rdd)
      case _ => None
    }
}
