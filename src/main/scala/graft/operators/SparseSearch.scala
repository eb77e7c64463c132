package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.BruteForce.topK

/** Sparse vector search — the reference's sparse brute force
  * (`brute_force.cc:629-747`) and inverted index
  * (`src/index/sparse/sparse_inverted_index.h:93-989`), re-expressed
  * relationally:
  *
  *   - a sparse row (sorted (index,value) pairs, `sparse_utils.h:96-254`)
  *     becomes rows of a postings table `(term, id, tf)` — i.e. the exploded
  *     inverted index IS the DataFrame;
  *   - the sorted-merge dot product (`sparse_utils.h:203-225`) becomes
  *     join-on-term + per-pair sum;
  *   - per-dim max-score pruning (WAND/MaxScore, `:699-830`) maps to a
  *     term-level bound filter; exactness when pruning is off
  *     (`drop_ratio_search=0`), which is what the oracle checks.
  *
  * Scale shape: postings are partitioned by term (the natural shuffle key);
  * the query side is small and broadcast; scores partial-aggregate map-side
  * before the (qid,id) shuffle.
  */
object SparseSearch {

  /** Term frequencies from a text column: `(id, term, tf)` postings. */
  def postings(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol).as("id"), explode(split(col(textCol), " ")).as("term"))
      .groupBy(col("id"), col("term"))
      .agg(count(lit(1)).as("tf"))

  /** Document lengths (token counts) — BM25's `dl`; the reference collects
    * these as `row_sums` at Train/Add (`sparse_inverted_index.h:398-427`). */
  def docLengths(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("id"), size(split(col(textCol), " ")).as("dl"))

  /** Exact sparse IP top-k: score = Σ_t qtf·tf over shared terms.
    * Integer products ⇒ exact double sums at any accumulation order. */
  def searchIP(
      queryPostings: DataFrame, // (qid, term, qtf)
      basePostings: DataFrame, // (id, term, tf)
      k: Int
  ): DataFrame = {
    val scored = broadcast(queryPostings)
      .join(basePostings, "term")
      .groupBy(col("qid"), col("id").as("nid"))
      .agg(sum(col("qtf") * col("tf")).cast("double").as("dist"))
    topK(scored, k, ascending = false)
  }

  /** Exact BM25 top-k (S16): score = Σ_t qtf · idf(t) · tf·(k1+1)/(tf +
    * k1·(1−b+b·dl/avgdl)), with idf = ln((N−df+0.5)/(df+0.5)+1) from
    * corpus stats. Per-term contributions are scaled by 1e9, rounded to
    * integers, and summed as LONG — an exact integer sum, so the total is
    * accumulation-order-independent (oracle parity) with no per-row
    * BigDecimal on the hot path. Overflow headroom: contributions are
    * O(qtf·idf·(k1+1)) ≲ 1e3 → ≲ 1e12 scaled; 9.2e18 Long capacity allows
    * millions of shared terms per (query, doc) pair. Reference weight:
    * `sparse_utils.h:62-66`; stats collection
    * `sparse_inverted_index.h:398-427`.
    */
  def searchBM25(
      queryPostings: DataFrame, // (qid, term, qtf)
      basePostings: DataFrame, // (id, term, tf)
      docLens: DataFrame, // (id, dl)
      k: Int,
      k1: Double = 1.2,
      b: Double = 0.75,
      roundDist: Option[Int] = Some(4)
  ): DataFrame = {
    // postings feed both the score join and the df stats — cache so the
    // tokenize+groupBy pass runs once (the reference caches row_sums and
    // max-score stats at Train the same way)
    basePostings.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // one stats job: N and Σdl together (corpus stats = the reference's
    // row_sums collection at Train, sparse_inverted_index.h:398-427)
    val statsRow = docLens.agg(count(lit(1)).as("n"), sum(col("dl")).cast("double").as("s")).head()
    val n = statsRow.getLong(0).toDouble
    val avgdl = statsRow.getDouble(1) / n
    val df = basePostings.groupBy("term").agg(count(lit(1)).as("df"))
    val idf = log(
      (lit(n) - col("df").cast("double") + 0.5d) / (col("df").cast("double") + 0.5d) + 1.0d)
    val tfw = col("tf").cast("double") * (k1 + 1.0d) /
      (col("tf").cast("double") + lit(k1) * (lit(1.0d - b) + lit(b / avgdl) * col("dl").cast("double")))
    val contrib = round(col("qtf").cast("double") * idf * tfw * 1e9d, 0).cast("long")
    val scored = broadcast(queryPostings)
      .join(basePostings, "term")
      .join(df, "term")
      .join(docLens.withColumnRenamed("id", "bid"), col("id") === col("bid"))
      .groupBy(col("qid"), col("id").as("nid"))
      .agg((sum(contrib).cast("double") / 1e9d).as("raw"))
    val d = roundDist.map(r => round(col("raw"), r)).getOrElse(col("raw"))
    topK(scored.select(col("qid"), col("nid"), d.as("dist")), k, ascending = false)
  }

  /** Query-term pruning — the `drop_ratio_search` analog
    * (`sparse_inverted_index.h:643-663`): drop query terms with tf below a
    * threshold before the join. Exact when threshold=0. */
  def pruneQueryTerms(queryPostings: DataFrame, minTf: Long): DataFrame =
    queryPostings.filter(col("qtf") >= minTf)

  /** Exact sparse IP range search (S2 over sparse rows): all docs with
    * score inside the similarity-direction bound radius < score <=
    * rangeFilter (`range_util.h:22-25` — IP/BM25 invert the L2 direction).
    * Output is the exploded CSR (variable rows per qid). */
  def rangeIP(
      queryPostings: DataFrame, // (qid, term, qtf)
      basePostings: DataFrame, // (id, term, tf)
      radius: Double,
      rangeFilter: Double
  ): DataFrame =
    broadcast(queryPostings)
      .join(basePostings, "term")
      .groupBy(col("qid"), col("id").as("nid"))
      .agg(sum(col("qtf") * col("tf")).cast("double").as("dist"))
      .filter(col("dist") > radius && col("dist") <= rangeFilter)

  /** Exact top-k IP with MaxScore-style essential-list pruning
    * (`sparse_inverted_index.h:759-830`): the reference splits the query's
    * posting lists into essential / non-essential by cumulative per-dim
    * max-score against the running heap threshold, and only walks essential
    * lists. The batch rendering keeps that structure — and, unlike the WAND
    * rendering, never materializes the full postings join:
    *
    *   1. per-term `max_tf` comes from index-time stats (the reference's
    *      max-score upkeep, `:384-392`), so per-(qid,term) upper bounds
    *      UB(t) = qtf·max_tf(t) need NO join with the postings;
    *   2. seed θ: the top-UB term's posting list alone yields k candidate
    *      docs; their EXACT scores (postings restricted to those docs) give
    *      θ = k-th best. If that list holds < k docs, θ = −∞ (no pruning);
    *   3. essential split: terms sorted by UB ascending; the maximal prefix
    *      with running ΣUB < θ is non-essential — a doc containing ONLY
    *      those terms scores ≤ ΣUB < θ and cannot enter the top-k;
    *   4. candidates = docs holding ≥ 1 essential term; only THEIR postings
    *      are joined and exactly scored.
    *
    * Admissible (strict < in step 3; every doc scoring ≥ θ holds an
    * essential term), so the output is IDENTICAL to [[searchIP]] — gated by
    * the same oracle. At scale the postings join touches only essential
    * lists ∪ candidate docs instead of every (query-term, doc) pair.
    */
  def searchIPMaxScoreExact(
      queryPostings: DataFrame, // (qid, term, qtf)
      basePostings: DataFrame, // (id, term, tf)
      k: Int
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window

    // every phase walks the postings — cache them once (the reference's
    // inverted index is equally a built artifact, not recomputed per phase)
    basePostings.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    queryPostings.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // index-time per-term stats (max-score array analog)
    val termStats = basePostings.groupBy(col("term")).agg(max(col("tf")).as("max_tf"))
    val ubt = queryPostings
      .join(termStats, "term") // query side is tiny — broadcast either way
      .select(col("qid"), col("term"), col("qtf"),
        (col("qtf") * col("max_tf")).cast("double").as("ub"))

    // 2: θ from the single top-UB term's list, exactly scored
    val wTop = Window.partitionBy(col("qid")).orderBy(col("ub").desc, col("term").asc)
    val topTerm = ubt
      .withColumn("_rn", row_number().over(wTop))
      .filter(col("_rn") === 1)
      .select(col("qid"), col("term"), col("qtf"))
    val seedPairs = basePostings
      .join(broadcast(topTerm), "term")
      .select(col("qid"), col("id").as("nid"), (col("qtf") * col("tf")).cast("double").as("dist"))
    val seeds = topK(seedPairs, k, ascending = false).select(col("qid"), col("nid").as("id"))
    val seedScores = basePostings
      .join(broadcast(seeds.select(col("id")).distinct()), "id")
      .join(broadcast(queryPostings), "term")
      .join(broadcast(seeds), Seq("qid", "id"), "left_semi")
      .groupBy(col("qid"), col("id"))
      .agg(sum(col("qtf") * col("tf")).cast("double").as("score"))
    val theta = topK(
      seedScores.select(col("qid"), col("id").as("nid"), col("score").as("dist")),
      k, ascending = false)
      .groupBy(col("qid"))
      .agg(min(col("dist")).as("_kth"), count(lit(1)).as("_c"))
      .select(col("qid"),
        when(col("_c") >= k, col("_kth")).otherwise(lit(Double.MinValue)).as("theta"))

    // 3: essential terms = suffix (by ascending UB) whose running ΣUB ≥ θ
    val wCum = Window
      .partitionBy(col("qid"))
      .orderBy(col("ub").asc, col("term").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val essential = ubt
      .withColumn("cum", sum(col("ub")).over(wCum))
      .join(broadcast(theta), "qid")
      .filter(col("cum") >= col("theta"))
      .select(col("qid"), col("term"))

    // 4: candidates and their exact scores — the only postings join
    val candidates = basePostings
      .join(broadcast(essential), "term")
      .select(col("qid"), col("id"))
      .dropDuplicates("qid", "id")
    val exact = basePostings
      .join(candidates.select(col("id")).distinct(), "id")
      .join(broadcast(queryPostings), "term")
      .join(candidates, Seq("qid", "id"), "left_semi")
      .groupBy(col("qid"), col("id").as("nid"))
      .agg(sum(col("qtf") * col("tf")).cast("double").as("dist"))
    topK(exact, k, ascending = false)
  }

  /** Exact top-k IP with WAND-style upper-bound pruning
    * (`sparse_inverted_index.h:699-757`): the reference prunes per-doc with
    * a pivot threshold from the running heap; the batch rendering is
    * two-phase —
    *
    *   1. seed: the top-k docs per query by any *single* posting
    *      contribution; their exact scores give threshold θ = k-th best;
    *   2. prune: per-term max-contribution bounds give UB(doc) = Σ_t
    *      max-contrib(t); docs with UB < θ cannot reach the top-k and are
    *      never fully scored; survivors are scored exactly.
    *
    * Admissible (UB ≥ exact score, seeds always survive), so the result is
    * IDENTICAL to [[searchIP]] — gated by the same oracle. At scale the win
    * is skipping the full (qid,doc) score aggregation for the long tail of
    * weak-overlap docs.
    */
  def searchIPWandExact(
      queryPostings: DataFrame, // (qid, term, qtf)
      basePostings: DataFrame, // (id, term, tf)
      k: Int
  ): DataFrame = {
    val contribs = broadcast(queryPostings)
      .join(basePostings, "term")
      .select(col("qid"), col("id"), col("term"), (col("qtf") * col("tf")).cast("double").as("contrib"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // phase 1: seeds and threshold θ(qid) = k-th best exact seed score
    val seedDocs = BruteForce
      .topK(contribs.select(col("qid"), col("id").as("nid"), col("contrib").as("dist")),
        k, ascending = false)
      .select(col("qid"), col("nid").as("id"))
    val seedScores = seedDocs
      .join(contribs, Seq("qid", "id"))
      .groupBy(col("qid"), col("id"))
      .agg(sum(col("contrib")).as("score"))
    val theta = BruteForce
      .topK(seedScores.select(col("qid"), col("id").as("nid"), col("score").as("dist")),
        k, ascending = false)
      .groupBy(col("qid"))
      .agg(min(col("dist")).as("theta"))

    // phase 2: per-(qid,term) max contribution → UB per doc → prune → exact
    val ubt = contribs.groupBy(col("qid"), col("term")).agg(max(col("contrib")).as("ub"))
    val ub = contribs
      .join(ubt, Seq("qid", "term"))
      .groupBy(col("qid"), col("id"))
      .agg(sum(col("ub")).as("ub"))
    val survivors = ub
      .join(broadcast(theta), "qid")
      .filter(col("ub") >= col("theta"))
      .select(col("qid"), col("id"))
    val exact = survivors
      .join(contribs, Seq("qid", "id"))
      .groupBy(col("qid"), col("id").as("nid"))
      .agg(sum(col("contrib")).as("dist"))
    BruteForce.topK(exact, k, ascending = false)
  }
}
