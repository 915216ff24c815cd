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

  /** EAGER Column → Expression conversion. `expression(c)` returns a
    * lazy ColumnNodeExpression that only materializes when the Column
    * flows through the Dataset API — embedded directly in a SQL
    * function's expression tree it survives to codegen and dies with
    * "Cannot generate code for expression: columnnodeexpression".
    * Function builders that compose Column-layer library functions
    * must convert eagerly. */
  def eagerExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)

  /** Register a function on a LIVE session's FunctionRegistry — the
    * runtime complement to builder-time SparkSessionExtensions
    * injection (which cannot reach an already-built session, e.g. the
    * driver-owned one a gated query receives). `sessionState` is
    * `private[sql]`; this shim is the sanctioned access point. */
  def registerFunction(spark: org.apache.spark.sql.SparkSession,
                       name: org.apache.spark.sql.catalyst.FunctionIdentifier,
                       info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
                       builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry.registerFunction(name, info, builder)

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
