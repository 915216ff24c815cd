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

  /** Unwrap a sort Column (`col.desc` / `col.asc`) into its value column
    * and a descending flag. Sort direction lives in the ColumnNode layer
    * in Spark 4 (`internal.SortOrder`), NOT in the converted Catalyst
    * expression — `expression(c)` returns a lazy ColumnNodeExpression, so
    * matching it against Catalyst's SortOrder never fires and the whole
    * sort expression would flow on as a (non-evaluable) value. A bare
    * value Column returns (itself, false), matching orderBy's default
    * ascending. */
  def sortOrder(c: Column): (Column, Boolean) = c.node match {
    case so: org.apache.spark.sql.internal.SortOrder =>
      (Column(so.child),
        so.sortDirection == org.apache.spark.sql.internal.SortOrder.Descending)
    case _ => (c, false)
  }
}
