package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

import graft.operators.Cohort

/** Streaming day-N retention — the cohort dashboard kept RUNNING while
  * events arrive (batch op: `Cohort.retention`). Per-user `GroupState`
  * carries (cohort day, offsets already credited); each micro-batch emits
  * only the NOVEL (user, cohort_day, day_offset) cells, so the collected
  * update stream is exactly the batch op's distinct activity-cell frame and
  * the final render (`Cohort.renderRetention`) hash-matches the batch
  * oracle.
  *
  * Time-aligned micro-batches (the repo's streaming-twin contract) make the
  * greedy cohort pin correct: a user's first-ever event is in their first
  * batch, so the state's cohort day never needs revision. State is one int
  * plus a seen-offset set bounded by the dashboard horizon (days), not the
  * stream length.
  */
object StreamingCohort {

  final case class UserRetState(cohortDay: Int, seen: Seq[Int])

  /** Novel (user_id, cohort_day, day_offset) cells per micro-batch. */
  def retentionUpdates(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val ds = events
      .select(
        col("user_id"),
        datediff(to_date(col("ts")), to_date(lit("1970-01-01"))).as("day"))
      .as[(Long, Int)]
    ds.groupByKey(_._1)
      .flatMapGroupsWithState[UserRetState, (Long, Int, Int)](
        OutputMode.Update(), GroupStateTimeout.NoTimeout) {
        case (user, it, state) =>
          val days = it.map(_._2).toSeq
          val st = state.getOption
          val cohort = st.map(_.cohortDay).getOrElse(days.min)
          val seen = st.map(_.seen.toSet).getOrElse(Set.empty[Int])
          val novel = days.map(_ - cohort).toSet -- seen
          state.update(UserRetState(cohort, (seen ++ novel).toSeq))
          novel.iterator.map(o => (user, cohort, o))
      }
      .toDF("user_id", "cohort_day", "day_offset")
  }

  /** Render the accumulated update cells exactly as the batch op does. */
  def renderFinal(cells: DataFrame): DataFrame =
    Cohort.renderRetention(
      cells.select(col("user_id"), col("cohort_day"), col("day_offset")).distinct())
}
