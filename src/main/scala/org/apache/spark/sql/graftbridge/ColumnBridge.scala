package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/**
 * Spark 4 decoupled `Column` from catalyst `Expression` (columnNodeSupport); the
 * conversion helpers are package-private to org.apache.spark.sql, so this one-file
 * bridge (in a child package) re-exports them for graft's custom expressions.
 */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
