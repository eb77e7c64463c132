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

  final case class FirstTouchState(tUs: Long, eventId: Long, touchType: String)

  /** Streaming FIRST-touch attribution: per-user GroupState carries the
    * earliest touch seen ((ts, event_id, type) min-struct — the batch op's
    * exact order); each micro-batch credits its purchases against the
    * merged state. Time-aligned batches make the greedy credit equal the
    * batch semantics: any touch at-or-before a purchase is in the
    * purchase's batch or earlier, so the state's first touch IS the global
    * first touch whenever it qualifies. Emits (conv_id, channel,
    * conv_value) — each purchase exactly once. */
  def firstTouchUpdates(
      events: DataFrame,
      convType: String = "purchase",
      touchTypes: Seq[String] = Seq("view", "click")
  ): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val ds = events
      .filter(col("event_type").isin((convType +: touchTypes): _*))
      .select(
        col("user_id"),
        unix_micros(col("ts")).as("t_us"),
        col("event_id"),
        col("event_type"),
        round(col("value"), 4).as("v"))
      .as[(Long, Long, Long, String, Double)]
    ds.groupByKey(_._1)
      .flatMapGroupsWithState[FirstTouchState, (Long, String, Double)](
        OutputMode.Update(), GroupStateTimeout.NoTimeout) {
        case (_, it, state) =>
          val rows = it.toSeq
          val batchFirst = rows
            .filter(r => r._4 != convType)
            .map(r => FirstTouchState(r._2, r._3, r._4))
            .sortBy(t => (t.tUs, t.eventId, t.touchType))
            .headOption
          val first = (state.getOption.toSeq ++ batchFirst)
            .sortBy(t => (t.tUs, t.eventId, t.touchType))
            .headOption
          first.foreach(state.update)
          rows
            .filter(_._4 == convType)
            .iterator
            .map { p =>
              val channel = first
                .filter(_.tUs <= p._2)
                .map(_.touchType)
                .getOrElse("none")
              (p._3, channel, p._5)
            }
      }
      .toDF("conv_id", "channel", "conv_value")
  }

  /** Render accumulated credited conversions exactly as the batch op. */
  def renderAttribution(credited: DataFrame): DataFrame =
    Cohort.renderAttribution(credited)

  final case class ConvertState(v0: Long, p0: Long) // -1 = unset

  /** Streaming TIME-TO-CONVERT: per-user GroupState pins the first view
    * and the first purchase at-or-after it (the batch
    * `events_time_to_convert` semantics). Time-aligned micro-batches (the
    * twin contract) make the greedy pin exact: events replay in ts order
    * across batches, so the first view seen IS the global first view and
    * no earlier qualifying purchase can arrive later. Within a batch,
    * equal-timestamp views order before purchases so a same-instant
    * conversion qualifies, matching the oracle's `pt >= v0`. Emits
    * (user_id, convert_us) exactly once per converting user — the update
    * stream IS the batch result. State: two longs per user. */
  def timeToConvertUpdates(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val ds = events
      .filter(col("event_type").isin("view", "purchase"))
      .select(col("user_id"), unix_micros(col("ts")).as("t_us"), col("event_type"))
      .as[(Long, Long, String)]
    ds.groupByKey(_._1)
      .flatMapGroupsWithState[ConvertState, (Long, Long)](
        OutputMode.Update(), GroupStateTimeout.NoTimeout) {
        case (user, it, state) =>
          var st = state.getOption.getOrElse(ConvertState(-1L, -1L))
          val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
          it.toSeq
            .sortBy(r => (r._2, if (r._3 == "purchase") 1 else 0))
            .foreach { case (_, t, typ) =>
              if (typ == "view") { if (st.v0 < 0) st = ConvertState(t, st.p0) }
              else if (st.v0 >= 0 && st.p0 < 0 && t >= st.v0) {
                st = ConvertState(st.v0, t)
                out += ((user, st.p0 - st.v0))
              }
            }
          state.update(st)
          out.iterator
      }
      .toDF("user_id", "convert_us")
  }

  /** Streaming LAST-touch attribution: per-user GroupState carries only
    * the latest touch seen; each batch's rows replay in (ts, event_id)
    * order, so a purchase credits the newest touch at-or-before it —
    * including same-batch touches. Time-aligned batches make this the
    * batch as-of semantics: every touch at-or-before a purchase is in the
    * purchase's batch or earlier. Equal-ts touches keep the larger
    * event_id (the batch op's tie rule). State is ONE touch per user —
    * the as-of join's unbounded right side never accumulates. */
  def lastTouchUpdates(
      events: DataFrame,
      convType: String = "purchase",
      touchTypes: Seq[String] = Seq("view", "click")
  ): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val ds = events
      .filter(col("event_type").isin((convType +: touchTypes): _*))
      .select(
        col("user_id"),
        unix_micros(col("ts")).as("t_us"),
        col("event_id"),
        col("event_type"),
        round(col("value"), 4).as("v"))
      .as[(Long, Long, Long, String, Double)]
    ds.groupByKey(_._1)
      .flatMapGroupsWithState[FirstTouchState, (Long, String, Double)](
        OutputMode.Update(), GroupStateTimeout.NoTimeout) {
        case (_, it, state) =>
          var latest = state.getOption
          // touches sort BEFORE purchases at equal ts (the inclusive
          // t_us <= p_us bound must see same-instant touches)
          val out = it.toSeq.sortBy(r => (r._2, if (r._4 != convType) 0 else 1, r._3)).flatMap { r =>
            if (r._4 != convType) {
              if (latest.forall(t => t.tUs < r._2 || (t.tUs == r._2 && t.eventId < r._3))) {
                latest = Some(FirstTouchState(r._2, r._3, r._4))
              }
              Nil
            } else {
              val channel = latest
                .filter(_.tUs <= r._2)
                .map(_.touchType)
                .getOrElse("none")
              Seq((r._3, channel, r._5))
            }
          }
          latest.foreach(state.update)
          out.iterator
      }
      .toDF("conv_id", "channel", "conv_value")
  }
}
