package org.apache.spark.sql.classic

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to Spark's package-private Expression ⇄ Column conversion
  * (org.apache.spark.sql.classic.ExpressionUtils). Spark 4 removed the
  * public `new Column(expr)` constructor; this is the supported-shape
  * conversion the built-in functions use internally, re-exported for
  * graft's native expressions (graft.plans.NativeExpressions).
  */
object GraftShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Decompose a sort-spec Column (`col.desc`, `asc_nulls_last`, …) into
    * (key, isAscending, nullsFirst); None for a plain column. The
    * `internal.SortOrder` ColumnNode is private[sql], hence shimmed. */
  def sortSpec(c: Column): Option[(Column, Boolean, Boolean)] = c.node match {
    case so: org.apache.spark.sql.internal.SortOrder =>
      Some((new Column(so.child),
        so.sortDirection == org.apache.spark.sql.internal.SortOrder.Ascending,
        so.nullOrdering == org.apache.spark.sql.internal.SortOrder.NullsFirst))
    case _ => None
  }
}
