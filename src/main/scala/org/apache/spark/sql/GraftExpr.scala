package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the package-private classic Column↔Expression converters so
  * graft can wrap its native Catalyst expressions as Columns. */
object GraftExpr {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Analyzed logical plan of a DataFrame — for embedding as a child of a
    * custom logical node. */
  def logicalPlan(df: Dataset[_]): catalyst.plans.logical.LogicalPlan =
    df.queryExecution.analyzed

  /** Wrap a logical plan as a DataFrame (the package-private
    * `Dataset.ofRows`). */
  def ofRows(spark: SparkSession, plan: catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Strategies an extensions installer injected — test probe for the
    * `SparkSessionExtensions` registration path. */
  def plannerStrategies(
      ext: SparkSessionExtensions, spark: SparkSession): Seq[execution.SparkStrategy] =
    ext.buildPlannerStrategies(spark.asInstanceOf[classic.SparkSession])

  /** Release the blocks behind a `localCheckpoint`ed Dataset (its plan is a
    * LogicalRDD over a persisted RDD, which Dataset.unpersist doesn't
    * reach). No-op for non-checkpointed frames. */
  def unpersistCheckpoint(df: Dataset[_]): Unit =
    df.queryExecution.analyzed match {
      case lr: execution.LogicalRDD => lr.rdd.unpersist(false)
      case _ => ()
    }

  /** Whether a frame is already backed by materialized blocks — a
    * localCheckpoint's LogicalRDD or a CacheManager entry. Iterative
    * consumers use this to skip re-materializing an input the caller
    * already pinned. */
  def isMaterialized(df: Dataset[_]): Boolean = {
    val spark = df.sparkSession.asInstanceOf[classic.SparkSession]
    df.queryExecution.analyzed.isInstanceOf[execution.LogicalRDD] ||
      spark.sharedState.cacheManager
        .lookupCachedData(spark, df.queryExecution.analyzed).isDefined
  }

  /** Rebuild a `localCheckpoint`ed Dataset's LogicalRDD without its origin
    * stats/constraints. The checkpoint copies the source plan's constraint
    * set verbatim; when the checkpointed frame is then self-unioned (an
    * iterative builder unioning a frame with its own reversal),
    * `UnionBase.rewriteConstraints` looks those origin attributes up in the
    * union child's output map and throws `key not found` — the constraints
    * mention attributes the LogicalRDD no longer produces. Dropping them
    * loses only optimizer hints, never rows. No-op for non-checkpointed
    * frames. */
  def stripCheckpointConstraints(df: Dataset[_]): DataFrame =
    df.queryExecution.analyzed match {
      case lr: execution.LogicalRDD =>
        val clean = new execution.LogicalRDD(
          lr.output, lr.rdd, lr.outputPartitioning, lr.outputOrdering,
          lr.isStreaming, lr.stream)(
          df.sparkSession.asInstanceOf[classic.SparkSession], None, None)
        ofRows(df.sparkSession, clean)
      case _ => df.toDF()
    }
}
