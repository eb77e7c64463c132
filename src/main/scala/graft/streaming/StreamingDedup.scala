package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

import graft.operators.Dedup

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

  final case class BandKeyState(minId: Long)

  /** Streaming MinHash-LSH near-dup BLOCKING — the LSH stage of the dedup
    * pipeline as a stateful stream: per (band, band-key) the state carries
    * the minimum doc id ever seen; an arriving document COLLIDES when any
    * of its band keys was already seen under a smaller id (an earlier
    * micro-batch, or an earlier id inside this batch — the group's rows
    * are processed in ascending id order, so the semantics are exactly
    * "∃ earlier doc sharing a band key" regardless of the batch split —
    * the batch oracle's self-join).
    *
    * Signatures are the pure per-row HOF form ([[Dedup.minhashSignature]]
    * — no pre-aggregation, the stateful op is the only stateful stage).
    * Emits one (doc_id, hit) row per (doc, band); the caller folds
    * max(hit) per doc. Scale shape: state is one long per distinct band
    * key, shuffled on the band key — the streaming twin of the batch band
    * join, with history standing in for the self-join's other side. */
  def lshCollisionUpdates(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // band keys as STATIC projections (same values as the batch path's
    // relational signatures): shingle once, 16 codegen'd min columns, band
    // folds — the nested-HOF per-row signature measured 12× slower here,
    // and streaming forbids the batch path's aggregation before the
    // stateful operator. All stages below are stateless projections.
    val withSh = docs.select(col("doc_id").cast("long").as("doc_id"),
      Dedup.shingleHashes(col("text")).as("sh"))
    val minCols = (0 until Dedup.NumPerm).map(i =>
      array_min(transform(col("sh"), x => Dedup.perm(lit(i.toLong), x))).as(s"m$i"))
    val withMins = withSh.select(col("doc_id") +: minCols: _*)
    val banded = withMins
      .select(col("doc_id"), explode(array((0 until Dedup.Bands).map(b =>
        struct(lit(b).as("band"), Dedup.bandCol(b).as("bh"))): _*)).as("x"))
      .select(col("doc_id"), col("x.band").as("band"), col("x.bh").as("bh"))
      .as[(Long, Int, Long)]
    banded
      .groupByKey(r => (r._2, r._3))
      .flatMapGroupsWithState[BandKeyState, (Long, Int)](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        case (_, it, state) =>
          val ids = it.map(_._1).toArray.sorted
          var minSeen = state.getOption.map(_.minId).getOrElse(Long.MaxValue)
          val out = ids.map { id =>
            val hit = if (minSeen < id) 1 else 0
            if (id < minSeen) minSeen = id
            (id, hit)
          }
          state.update(BandKeyState(minSeen))
          out.iterator
      }
      .toDF("doc_id", "hit")
  }
}
