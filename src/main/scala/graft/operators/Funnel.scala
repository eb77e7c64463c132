package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sequential conversion funnel over an event stream — the product-
  * analytics aggregation (view → click → purchase) every event pipeline
  * ships next to sessionization: step i counts users whose FIRST
  * qualifying step-i event happens strictly after their first qualifying
  * step-(i−1) event (the strict-ordering funnel, not mere set
  * membership).
  *
  * Determinism: each step keeps min(ts) per user — order-insensitive —
  * and conversion is integer basis points off step 1, so the whole frame
  * hash-gates.
  *
  * Scale shape: every step is a filter + groupBy(user) + same-key join —
  * all shuffles land on the user key, so AQE coalesces them into one
  * exchange chain; per-step outputs shrink monotonically and the final
  * counts are one tiny row per step. No windows, no cross-user state. */
object Funnel {

  def steps(
      events: DataFrame,
      stepTypes: Seq[String],
      userCol: String = "user_id",
      typeCol: String = "event_type",
      tsCol: String = "ts"
  ): DataFrame = {
    require(stepTypes.nonEmpty, "funnel needs at least one step")
    // fold: frame i = (user, t = first step-i event after frame i-1's t)
    val frames = stepTypes.tail.scanLeft(
      events
        .filter(col(typeCol) === stepTypes.head)
        .groupBy(col(userCol))
        .agg(min(col(tsCol)).as("t"))
    ) { (prev, st) =>
      events
        .filter(col(typeCol) === st)
        .select(col(userCol), col(tsCol).as("_ts"))
        .join(prev, userCol)
        .filter(col("_ts") > col("t"))
        .groupBy(col(userCol))
        .agg(min(col("_ts")).as("t"))
    }
    val counts = frames
      .zip(stepTypes)
      .zipWithIndex
      .map { case ((f, st), i) =>
        f.agg(count(lit(1)).as("users"))
          .select(lit(st).as("step"), lit(i + 1).as("step_ord"), col("users"))
      }
      .reduce(_.unionByName(_))
    val base = counts.filter(col("step_ord") === 1).select(col("users").as("base"))
    counts
      .crossJoin(broadcast(base))
      .select(
        col("step"),
        col("step_ord"),
        col("users"),
        expr("CAST(users * 10000 DIV base AS BIGINT)").as("conv_bp"))
  }
}
