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
}
