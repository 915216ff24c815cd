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

  /** Unwrap a sort Column (`col.desc` / `col.asc`) into (value column,
    * descending flag, default-null-ordering flag). Sort direction lives
    * in the ColumnNode layer in Spark 4 (`internal.SortOrder`), NOT in
    * the converted Catalyst expression — `expression(c)` returns a lazy
    * ColumnNodeExpression, so matching it against Catalyst's SortOrder
    * never fires and the whole sort expression would flow on as a
    * (non-evaluable) value. The third element is true iff the null
    * ordering is the direction's default (asc → nulls first, desc →
    * nulls last) — consumers that reason about null placement from the
    * direction alone must bail out when it is false. A bare value Column
    * returns (itself, false, true), matching orderBy's defaults. */
  def sortOrder(c: Column): (Column, Boolean, Boolean) = c.node match {
    case so: org.apache.spark.sql.internal.SortOrder =>
      import org.apache.spark.sql.internal.{SortOrder => N}
      val desc = so.sortDirection == N.Descending
      val defaultNulls =
        if (desc) so.nullOrdering == N.NullsLast
        else so.nullOrdering == N.NullsFirst
      (Column(so.child), desc, defaultNulls)
    case _ => (c, false, true)
  }
}
