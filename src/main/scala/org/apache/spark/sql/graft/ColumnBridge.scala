package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Expression bridge for the native graft expressions — the one
  * place that touches the `private[sql]` classic converter, so everything
  * in the `graft.*` namespace stays on public Spark API.
  */
object ColumnBridge {
  def col(e: Expression): Column = ExpressionUtils.column(e)
  def expr(c: Column): Expression = ExpressionUtils.expression(c)
}
