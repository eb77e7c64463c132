package graft.operators

import org.apache.spark.sql.{DataFrame, GraftExpr, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.functions._

import graft.plans.{KnnJoinNode, KnnJoinStrategy}

/** Session-extension installer: `spark.sql.extensions=graft.GraftSparkExtensions`
  * (or `builder.withExtensions(new GraftSparkExtensions)`) plants the kNN
  * join strategy at session build time — the `SparkSessionExtensions`
  * registration path for deployments that cannot call
  * [[KnnJoin.register]] imperatively. */
class GraftSparkExtensionsImpl extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => KnnJoinStrategy)
    // naive window-top-k kNN → KnnJoinNode (the Rule[LogicalPlan] rung)
    ext.injectOptimizerRule(_ => graft.plans.KnnWindowRewrite)
  }
}

/** The kNN join as a first-class operator: a custom logical node planned by
  * [[graft.plans.KnnJoinStrategy]] into the fused physical execution
  * ([[graft.plans.KnnJoinExec]]). Same answer as [[BruteForce.knn]],
  * asserted by spec and gated by the `knn_join_exec` oracle query. */
object KnnJoin {

  /** Idempotently install the planner strategy (and the window-top-k
    * rewrite rule) on a live session. */
  def register(spark: SparkSession): Unit = {
    val exp = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].experimental
    if (!exp.extraStrategies.contains(KnnJoinStrategy))
      exp.extraStrategies = exp.extraStrategies :+ KnnJoinStrategy
    if (!exp.extraOptimizations.contains(graft.plans.KnnWindowRewrite))
      exp.extraOptimizations = exp.extraOptimizations :+ graft.plans.KnnWindowRewrite
  }

  /** queries (qid, qvec) × base (id, vec) → (qid, nid, dist, rnk), top-k
    * per query. The query side is the collected/broadcast side — same
    * bounded-side contract as [[BruteForce.knnFused]], ENFORCED by the
    * exec (an oversized query frame fails loudly instead of OOMing the
    * driver; `maxQueryBytes` tunes the cap). */
  def knnJoin(
      queries: DataFrame,
      base: DataFrame,
      k: Int,
      metric: Metric = Metric.L2,
      roundDist: Option[Int] = None,
      maxQueryBytes: Long = graft.plans.KnnJoinExec.DefaultMaxQueryBytes
  ): DataFrame = {
    require(Set("l2", "l2sq", "ip", "cosine").contains(metric.name),
      s"KnnJoin supports dense float metrics, got ${metric.name}")
    val spark = queries.sparkSession
    register(spark)
    val q = queries.select(col("qid").cast("long").as("qid"), col("qvec"))
    val b = base.select(col("id").cast("long").as("id"), col("vec"))
    val node = KnnJoinNode(
      GraftExpr.logicalPlan(q),
      GraftExpr.logicalPlan(b),
      k,
      metric.name,
      roundDist.getOrElse(-1),
      KnnJoinNode.resultAttrs(),
      maxQueryBytes)
    GraftExpr.ofRows(spark, node)
  }
}
