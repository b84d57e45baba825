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
}
