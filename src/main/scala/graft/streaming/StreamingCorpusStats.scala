package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupStateTimeout

import graft.operators.TextAnalysis

/** Streaming per-source corpus dashboard — the monitoring aggregation a
  * crawl pipeline keeps RUNNING while ingest goes on (the batch op is
  * `TextAnalysis.corpusSourceStats`): per source, `GroupState` carries the
  * five exact sums (docs, tokens, scaled quality, chars, lang-id hits)
  * across micro-batches. Because every per-doc metric is an exact long
  * (quality = the integer-exact scaled rational `TextAnalysis.qualityQi` —
  * the repo's determinism contract),
  * the state after any batch split equals the batch aggregate, and the
  * final rendering (integer half-up means via
  * `TextAnalysis.renderSourceStats`) hash-matches the batch oracle.
  *
  * Scale shape: the per-doc projection is stateless and map-side; state is
  * five longs per distinct source, shuffled on `source` — each micro-batch
  * moves only its own (source, 5-long) partial rows.
  */
object StreamingCorpusStats {

  final case class SourceState(
      nDocs: Long, nTokens: Long, sumQi: Long, sumChars: Long, langHits: Long)

  /** Running (source, n_docs, total_tokens, sum_qi, sum_chars, lang_hits)
    * updates over a streaming frame of documents rows. All five values only
    * grow, so the caller folds max() per source for the final state. */
  def sourceStatsUpdates(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val ds = TextAnalysis
      .sourceStatsPerDoc(docs)
      .select(col("source"), col("n_tokens"), col("qi"), col("n_chars"), col("lang_hit"))
      .as[(String, Long, Long, Long, Long)]
    ds.groupByKey(_._1)
      .mapGroupsWithState[SourceState, (String, Long, Long, Long, Long, Long)](
        GroupStateTimeout.NoTimeout) {
        case (source, it, state) =>
          val st = state.getOption.getOrElse(SourceState(0L, 0L, 0L, 0L, 0L))
          var (n, tok, qi, ch, lh) = (st.nDocs, st.nTokens, st.sumQi, st.sumChars, st.langHits)
          it.foreach { r =>
            n += 1; tok += r._2; qi += r._3; ch += r._4; lh += r._5
          }
          state.update(SourceState(n, tok, qi, ch, lh))
          (source, n, tok, qi, ch, lh)
      }
      .toDF("source", "n_docs", "total_tokens", "sum_qi", "sum_chars", "lang_hits")
  }

  /** Fold the update stream's rows to the final state and render the
    * dashboard means exactly as the batch op does. `n_docs` strictly grows
    * with every update a source receives, so max_by(·, n_docs) picks the
    * LATEST state row — sum_qi itself need not be monotone (per-doc
    * quality can be negative), so a plain max() would be wrong. */
  def renderFinal(updates: DataFrame): DataFrame =
    TextAnalysis.renderSourceStats(
      updates
        .groupBy(col("source"))
        .agg(
          max(col("n_docs")).as("n_docs"),
          max_by(col("total_tokens"), col("n_docs")).as("total_tokens"),
          max_by(col("sum_qi"), col("n_docs")).as("sum_qi"),
          max_by(col("sum_chars"), col("n_docs")).as("sum_chars"),
          max_by(col("lang_hits"), col("n_docs")).as("lang_hits")))
}
