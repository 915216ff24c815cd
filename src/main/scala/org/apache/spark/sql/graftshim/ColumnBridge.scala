package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to the classic Column ⇄ Expression converters, which are
  * `private[sql]` in Spark 4 (Column is ColumnNode-backed there). Living
  * under org.apache.spark.sql grants the needed access — the standard
  * technique for libraries that define custom Catalyst expressions. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
