package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the package-private classic Column↔Expression converters so
  * graft can wrap its native Catalyst expressions as Columns. */
object GraftExpr {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Release the blocks behind a `localCheckpoint`ed Dataset (its plan is a
    * LogicalRDD over a persisted RDD, which Dataset.unpersist doesn't
    * reach). No-op for non-checkpointed frames. */
  def unpersistCheckpoint(df: Dataset[_]): Unit =
    df.queryExecution.analyzed match {
      case lr: execution.LogicalRDD => lr.rdd.unpersist(false)
      case _ => ()
    }
}
