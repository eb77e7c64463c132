package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupStateTimeout

/** Streaming exact dedup — the pipeline's dedup stage as a stateful
  * stream (`KeyValueGroupedDataset.mapGroupsWithState` keyed by the
  * content digest): per digest, `GroupState` carries (surviving doc id,
  * copies seen) across micro-batches, so a duplicate arriving batches
  * after the original is still dropped. The survivor is the MINIMUM doc
  * id seen so far — order-insensitive, so the final state equals the
  * batch oracle's min-id-per-digest whatever the batch split.
  *
  * Scale shape: state is one tiny record per distinct digest, partitioned
  * by digest (the natural shuffle key); each micro-batch shuffles only its
  * own (digest, id) rows.
  */
object StreamingDedup {

  final case class DupState(keptId: Long, copies: Long)

  /** Running (doc_id = surviving id, n_copies) updates per content digest
    * over a streaming frame of (doc_id, text) rows. */
  def dedupUpdates(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val ds = docs
      .select(md5(col("text").cast("binary")), col("doc_id").cast("long"))
      .as[(String, Long)]
    ds.groupByKey(_._1)
      .mapGroupsWithState[DupState, (String, Long, Long)](GroupStateTimeout.NoTimeout) {
        case (digest, it, state) =>
          val ids = it.map(_._2).toArray
          val st = state.getOption.getOrElse(DupState(Long.MaxValue, 0L))
          val kept = math.min(st.keptId, ids.min)
          val copies = st.copies + ids.length
          state.update(DupState(kept, copies))
          (digest, kept, copies)
      }
      .toDF("digest", "doc_id", "n_copies")
  }
}
