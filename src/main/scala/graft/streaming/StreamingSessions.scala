package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupStateTimeout

/** Stateful streaming sessionization — the custom-state streaming surface
  * (SURVEY §7/M6: `KeyValueGroupedDataset.mapGroupsWithState`): gap-based
  * sessions accumulate per user ACROSS micro-batches, the per-user
  * `GroupState` carrying (last event time, session count, event count) so
  * a session spanning a batch boundary is not double-counted.
  *
  * Within a batch each user's events are sorted by (ts, event_id) — the
  * same deterministic order as the batch sessionization — and the batch
  * split must be time-aligned (events of batch n+1 after batch n per
  * user), which the micro-batch file source provides when fed time-split
  * files. Emits the RUNNING totals per user each batch (update mode);
  * totals are monotone, so the final state per user is the max.
  */
object StreamingSessions {

  final case class SessState(lastTs: Long, nSessions: Int, nEvents: Long)

  /** Running (user_id, n_sessions, n_events) updates over a streaming
    * frame of (user_id, event_id, ts) rows. */
  def sessionUpdates(events: DataFrame, gapMicros: Long): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val ds = events
      .select(
        col("user_id").cast("long"),
        col("event_id").cast("long"),
        unix_micros(col("ts")))
      .as[(Long, Long, Long)]
    ds.groupByKey(_._1)
      .mapGroupsWithState[SessState, (Long, Int, Long)](GroupStateTimeout.NoTimeout) {
        case (uid, it, state) =>
          val evs = it.toArray.sortBy(e => (e._3, e._2))
          val st = state.getOption.getOrElse(SessState(Long.MinValue, 0, 0L))
          var last = st.lastTs
          var ns = st.nSessions
          var ne = st.nEvents
          evs.foreach { e =>
            if (last == Long.MinValue || e._3 - last > gapMicros) ns += 1
            last = e._3
            ne += 1
          }
          state.update(SessState(last, ns, ne))
          (uid, ns, ne)
      }
      .toDF("user_id", "n_sessions", "n_events")
  }
}
