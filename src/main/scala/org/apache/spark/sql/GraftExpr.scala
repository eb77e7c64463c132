package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the package-private classic Column↔Expression converters so
  * graft can wrap its native Catalyst expressions as Columns. */
object GraftExpr {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
