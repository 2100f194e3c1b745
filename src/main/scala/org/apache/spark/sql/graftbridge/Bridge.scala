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

  /** Dataset from a raw LogicalPlan (`Dataset.ofRows` is private[sql]) —
    * needed by custom whole-operator plans (GroupTopKPlan) to hand a
    * user-built logical node back to the session for analysis. */
  def dataset(spark: org.apache.spark.sql.SparkSession,
              plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** The analyzed LogicalPlan behind a DataFrame (classic API accessor). */
  def logicalPlan(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.queryExecution.analyzed

  /** Spark's own CAST_OVERFLOW error (SparkArithmeticException with the
    * engine's error class), for native kernels that replicate an ANSI
    * cast and must fail with the SAME exception the built-in chain
    * throws — `QueryExecutionErrors` is `private[sql]`. */
  def castOverflowError(value: Any,
                        from: org.apache.spark.sql.types.DataType,
                        to: org.apache.spark.sql.types.DataType)
      : ArithmeticException =
    org.apache.spark.sql.errors.QueryExecutionErrors
      .castingCauseOverflowError(value, from, to)

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
