package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM training pipelines: concatenate documents in a
  * deterministic pseudo-random order and chunk the stream every `budget`
  * tokens (GPT-style concat-and-chunk). Every step is layout-independent —
  * the order comes from a content-derived md5 key, never from partition or
  * row position — so the packing is bit-reproducible across runs, cluster
  * sizes, and input file orderings.
  *
  * Scale shape: packing inherently needs a running token offset, which is
  * sequential — but only WITHIN a shard. Sharding by the first md5 hex
  * digit gives 16 uniform, content-addressed streams whose cumsums run in
  * parallel (at 100 TB, widen the prefix: 2 hex chars = 256 shards, 3 =
  * 4096). One shuffle on the shard key + an in-partition sort; no
  * driver-side state, no global sort.
  */
object Packing {

  /** Per-document packing assignment: (doc_id, shard, n_tokens, seq_no,
    * tok_offset) where `seq_no` is the fixed-`budget` training sequence
    * (within its shard) in which the document STARTS, and `tok_offset` its
    * token offset inside that sequence. Whitespace token count — the
    * corpus-wide convention of [[TextAnalysis.tokenStats]]. All arithmetic
    * is integer-exact (`div`/`%` on longs), so the oracle matches bit-for-
    * bit at any scale.
    */
  def packSequences(
      docs: DataFrame, // (doc_id, text)
      budget: Int = 2048,
      idCol: String = "doc_id",
      textCol: String = "text"
  ): DataFrame = {
    require(budget > 0, s"token budget must be positive, got $budget")
    val keyed = docs.select(
      col(idCol),
      size(split(col(textCol), " ")).as("n_tokens"),
      md5(col(idCol).cast("string").cast("binary")).as("h"))
    // exclusive running token count in content-hash order, per shard
    val w = Window
      .partitionBy(substring(col("h"), 1, 1))
      .orderBy(col("h"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    keyed
      .select(
        col(idCol),
        substring(col("h"), 1, 1).as("shard"),
        col("n_tokens"),
        coalesce(sum(col("n_tokens").cast("long")).over(w), lit(0L)).as("start_tok"))
      .select(
        col(idCol),
        col("shard"),
        col("n_tokens"),
        expr(s"start_tok div $budget").as("seq_no"),
        (col("start_tok") % budget).as("tok_offset"))
  }

  /** Per-sequence roll-up: how full each packed sequence is. The tail
    * document of a sequence may straddle into the next (concat-and-chunk
    * semantics), so `tokens_started` counts tokens of documents that BEGIN
    * in the sequence. */
  def packedSequenceStats(packed: DataFrame): DataFrame =
    packed
      .groupBy(col("shard"), col("seq_no"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens").cast("long")).as("tokens_started"))

  /** Deterministic BALANCED output sharding — "write the corpus as S
    * training shards of near-equal byte volume": docs rank size-descending
    * (ties by id) and deal round-robin onto shards, the classic LPT-style
    * greedy that bounds any shard's excess by one max-document. The rank
    * is TWO-PHASE (per-size bucket counts → broadcast prefix offsets →
    * in-bucket rank by id), so no corpus-wide single-reducer sort exists —
    * the same shape as shuffleRank/curriculumRank. Output: (doc_id, shard)
    * plus the doc's size for downstream writers to partition on. */
  def shardAssign(
      docs: DataFrame, // (doc_id, n_chars)
      shards: Int
  ): DataFrame = {
    require(shards >= 1, s"shards must be >= 1, got $shards")
    import org.apache.spark.sql.expressions.Window
    val spark = docs.sparkSession
    import spark.implicits._
    val keyed = docs.select(col("doc_id"), col("n_chars"))
    val counts = keyed.groupBy(col("n_chars")).count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).sortBy(-_._1)
    val offsets = counts.map(_._1).zip(
      counts.map(_._2).scanLeft(0L)(_ + _).dropRight(1)).toMap
    val offDf = broadcast(offsets.toSeq.toDF("n_chars", "_off"))
    keyed
      .join(offDf, "n_chars")
      .withColumn("_rn",
        row_number().over(
          Window.partitionBy(col("n_chars")).orderBy(col("doc_id").asc)))
      .select(
        col("doc_id"),
        col("n_chars"),
        pmod(col("_off") + col("_rn") - 1, lit(shards.toLong)).cast("int").as("shard"))
  }

  /** Overlapping sliding-window chunking — the retrieval/context-window
    * sibling of [[packSequences]]: one chunk per `stride` offset while the
    * offset lies inside the document, truncated to `window` tokens at the
    * tail (so consecutive chunks share `window - stride` tokens of
    * context). Emits the chunk's token span plus its rolling fingerprint
    * ([[TextAnalysis.fingerprint]]) instead of the chunk text — at 100 TB
    * the explode fans out only ⌈n/stride⌉ fixed-width rows per document,
    * map-side, and the text column never leaves the scan.
    */
  def chunkOverlap(
      docs: DataFrame, // (doc_id, text)
      window: Int,
      stride: Int,
      textCol: String = "text"
  ): DataFrame = {
    require(window > 0, s"chunk window must be positive, got $window")
    require(
      stride > 0 && stride <= window,
      s"stride must be in [1, window], got stride=$stride window=$window")
    val t = TextAnalysis.tokens(col(textCol))
    val nTok = least(lit(window), col("_n") - col("_s"))
    docs
      .select(col("doc_id"), t.as("_t"), size(t).as("_n"))
      .select(
        col("doc_id"),
        col("_t"),
        col("_n"),
        explode(sequence(lit(0), col("_n") - 1, lit(stride))).as("_s"))
      .select(
        col("doc_id"),
        expr(s"CAST(_s DIV $stride AS INT)").as("chunk_idx"),
        col("_s").cast("int").as("start_tok"),
        nTok.cast("int").as("n_tokens"),
        TextAnalysis.fingerprint(slice(col("_t"), col("_s") + 1, nTok)).as("chunk_fp"))
  }
}
