package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupStateTimeout

/** Stateful streaming conversion funnel — the continuous twin of
  * [[graft.operators.Funnel.steps]]: per user, `GroupState` carries the
  * first qualifying timestamp of every reached step. Within a batch each
  * user's events process in (ts, event_id) order and the batch split must
  * be time-aligned (the [[StreamingSessions]] contract) — under ordered
  * arrival the greedy update (step i fires on the first event of its type
  * strictly after step i−1's time) IS the batch semantics "first
  * qualifying step-i event after the first qualifying step-(i−1) event".
  *
  * Emits (user_id, reached) each update; `reached` is monotone, so the
  * final per-user state is the max, and the step counts/conversions
  * render identically to the batch operator. State is n longs per user.
  */
object StreamingFunnel {

  final case class FunnelState(ts: Seq[Long])

  private val Unset = Long.MinValue

  /** Running (user_id, reached = consecutive completed steps) updates. */
  def funnelUpdates(events: DataFrame, stepTypes: Seq[String]): DataFrame = {
    require(stepTypes.nonEmpty, "funnel needs at least one step")
    val spark = events.sparkSession
    import spark.implicits._
    val stepIdx = stepTypes.zipWithIndex.toMap
    val ds = events
      .filter(col("event_type").isin(stepTypes: _*))
      .select(
        col("user_id").cast("long"),
        col("event_id").cast("long"),
        unix_micros(col("ts")),
        col("event_type"))
      .as[(Long, Long, Long, String)]
    ds.groupByKey(_._1)
      .mapGroupsWithState[FunnelState, (Long, Int)](GroupStateTimeout.NoTimeout) {
        case (uid, it, state) =>
          val evs = it.toArray.sortBy(e => (e._3, e._2))
          val ts = state.getOption
            .map(_.ts.toArray)
            .getOrElse(Array.fill(stepTypes.length)(Unset))
          evs.foreach { e =>
            val i = stepIdx(e._4)
            if (ts(i) == Unset &&
              (i == 0 || (ts(i - 1) != Unset && e._3 > ts(i - 1))))
              ts(i) = e._3
          }
          state.update(FunnelState(ts.toSeq))
          (uid, ts.takeWhile(_ != Unset).length)
      }
      .toDF("user_id", "reached")
  }

  /** Fold the update stream to the final per-user depth (monotone → max)
    * and render the same (step, step_ord, users, conv_bp) frame as the
    * batch operator. */
  def renderFinal(updates: DataFrame, stepTypes: Seq[String]): DataFrame = {
    val depth = updates.groupBy(col("user_id")).agg(max(col("reached")).as("reached"))
    val counts = stepTypes.zipWithIndex
      .map { case (st, i) =>
        depth.filter(col("reached") > i)
          .agg(count(lit(1)).as("users"))
          .select(lit(st).as("step"), lit(i + 1).as("step_ord"), col("users"))
      }
      .reduce(_.unionByName(_))
    val base = counts.filter(col("step_ord") === 1).select(col("users").as("base"))
    counts
      .crossJoin(broadcast(base))
      .select(col("step"), col("step_ord"), col("users"),
        expr("CAST(users * 10000 DIV base AS BIGINT)").as("conv_bp"))
  }
}
