package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.operators.BruteForce.topK

/** Built sparse inverted index — the reference's
  * `sparse::InvertedIndex` artifact (`src/index/sparse/
  * sparse_inverted_index.h:93-989`): posting lists plus the per-dim
  * max-score stats that WAND/MaxScore pruning rides (`:384-392`), and the
  * BM25 corpus stats collected at Train/Add (`:398-427`).
  *
  * Relational rendering: `postings (term, id, tf, dl)` — doc length folded
  * in at build so BM25 scoring needs NO per-doc join at search time — and
  * `termStats (term, df, max_tf, min_tf)`. BM25's corpus stats (N, avgdl)
  * and per-term max BM25 weight are LAZY: IP searches never pay for them.
  * All index tables persist; `drop()` releases the cache — callers own
  * the lifecycle, nothing is left silently cached.
  */
final class SparseIndexModel(
    val postings: DataFrame, // (term, id, tf, dl)
    val termStats: DataFrame, // (term, df, max_tf, min_tf)
    corpusStats: => (Long, Double), // (N, avgdl) — forced by BM25 paths only
    val k1: Double,
    val b: Double,
    bm25Stats: Option[DataFrame] = None
) {
  private lazy val cs = corpusStats
  def n: Long = cs._1
  def avgdl: Double = cs._2

  /** Per-term max BM25 tf-weight (max-score upkeep with BM25 weighting,
    * `sparse_inverted_index.h:384-392`) — computed on first BM25-pruned
    * search, cached. */
  @volatile private var bm25StatsForced = false
  lazy val bm25TermStats: DataFrame = bm25Stats.getOrElse {
    val tfw = col("tf").cast("double") * (k1 + 1.0d) /
      (col("tf").cast("double") + lit(k1) * (lit(1.0d - b) + lit(b / avgdl) * col("dl").cast("double")))
    bm25StatsForced = true
    postings
      .groupBy(col("term"))
      .agg(max(tfw).as("max_w"))
      .persist(StorageLevel.MEMORY_AND_DISK)
  }

  /** Segment MERGE — the compaction verb over two sealed sparse segments
    * (the CC kinds append into one growing index, `sparse_index_node.cc:
    * 431-470`; compaction above the verbs merges sealed ones): postings
    * concatenate (disjoint doc-id segments), term stats merge
    * ALGEBRAICALLY (df adds, max/min fold) — no postings re-scan. Corpus
    * stats (N, avgdl) are recomputed lazily from the merged postings (one
    * aggregate, the exact same fold a fresh build runs — avgdl is
    * sum/count, and re-deriving it beats merging two rounded means);
    * BM25 per-term bounds depend on avgdl, so they lazily rebuild on the
    * merged corpus. Search over the merged model answers exactly as a
    * single build over the union. */
  def merge(other: SparseIndexModel): SparseIndexModel = {
    require(k1 == other.k1 && b == other.b,
      s"cannot merge BM25 params ($k1,$b) with (${other.k1},${other.b})")
    val mergedPostings = postings.unionByName(other.postings)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val mergedStats = termStats
      .select(col("term"), col("df"), col("max_tf"), col("min_tf"))
      .unionByName(
        other.termStats.select(col("term"), col("df"), col("max_tf"), col("min_tf")))
      .groupBy(col("term"))
      .agg(
        sum(col("df")).as("df"),
        max(col("max_tf")).as("max_tf"),
        min(col("min_tf")).as("min_tf"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    def corpus: (Long, Double) = {
      val org.apache.spark.sql.Row(nDocs: Long, sumDl: Double) = mergedPostings
        .groupBy(col("id")).agg(first(col("dl")).as("dl"))
        .agg(count(lit(1)), sum(col("dl")).cast("double"))
        .head()
      (nDocs, sumDl / nDocs)
    }
    new SparseIndexModel(mergedPostings, mergedStats, corpus, k1, b)
  }

  /** Release the cached index tables (Serialize-free teardown). */
  def drop(): Unit = {
    postings.unpersist()
    termStats.unpersist()
    bm25Stats.foreach(_.unpersist())
    // the lazily derived BM25 stats persist on first force; without this
    // a build()-sourced model (bm25Stats = None) would leak that cache
    if (bm25StatsForced) bm25TermStats.unpersist()
  }

  /** Serialize (BinarySet analog, `index_node.h:371-401`): parquet tables
    * plus a one-row meta table. Forces the lazy BM25 stats so the saved
    * artifact is complete. */
  def save(dir: String): Unit = {
    postings.write.mode("overwrite").parquet(s"$dir/postings")
    termStats.join(bm25TermStats, Seq("term"), "left")
      .na.fill(0.0, Seq("max_w"))
      .write.mode("overwrite").parquet(s"$dir/term_stats")
    val spark = postings.sparkSession
    import spark.implicits._
    Seq((n, avgdl, k1, b)).toDF("n", "avgdl", "k1", "b")
      .write.mode("overwrite").parquet(s"$dir/meta")
  }
}

object SparseIndexModel {

  /** Build (Train+Add, `sparse_inverted_index.h:398-427`): tokenize,
    * postings with folded doc lengths, per-term stats. No job runs until
    * the first search; the postings scan is cached for every subsequent
    * search phase. */
  def build(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      k1: Double = 1.2,
      b: Double = 0.75
  ): SparseIndexModel = {
    val postings = docs
      .select(col(idCol).as("id"), split(col(textCol), " ").as("_toks"))
      .select(col("id"), size(col("_toks")).as("dl"), explode(col("_toks")).as("term"))
      .groupBy(col("id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .select(col("term"), col("id"), col("tf"), col("dl"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // per-term stats: df (postings are one row per (id,term)), max_tf for
    // IP bounds, min_tf for the nonnegativity guard
    val termStats = postings
      .groupBy(col("term"))
      .agg(
        count(lit(1)).as("df"),
        max(col("tf")).as("max_tf"),
        min(col("tf")).as("min_tf"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    def corpus: (Long, Double) = {
      val Row(nDocs: Long, sumDl: Double) = postings
        .groupBy(col("id")).agg(first(col("dl")).as("dl"))
        .agg(count(lit(1)), sum(col("dl")).cast("double"))
        .head()
      (nDocs, sumDl / nDocs)
    }
    new SparseIndexModel(postings, termStats, corpus, k1, b)
  }

  /** Deserialize a model written by [[SparseIndexModel#save]]. */
  def load(spark: SparkSession, dir: String): SparseIndexModel = {
    val meta = spark.read.parquet(s"$dir/meta").head()
    val stats = spark.read.parquet(s"$dir/term_stats").persist(StorageLevel.MEMORY_AND_DISK)
    new SparseIndexModel(
      spark.read.parquet(s"$dir/postings").persist(StorageLevel.MEMORY_AND_DISK),
      stats.select(col("term"), col("df"), col("max_tf"), col("min_tf")),
      (meta.getAs[Long]("n"), meta.getAs[Double]("avgdl")),
      meta.getAs[Double]("k1"),
      meta.getAs[Double]("b"),
      Some(stats.select(col("term"), col("max_w"))))
  }
}

/** Sparse vector search — the reference's sparse brute force
  * (`brute_force.cc:629-747`) and inverted index
  * (`src/index/sparse/sparse_inverted_index.h:93-989`), re-expressed
  * relationally:
  *
  *   - a sparse row (sorted (index,value) pairs, `sparse_utils.h:96-254`)
  *     becomes rows of a postings table `(term, id, tf)` — the exploded
  *     inverted index IS the DataFrame;
  *   - the sorted-merge dot product (`sparse_utils.h:203-225`) becomes
  *     join-on-term + per-pair sum;
  *   - WAND/MaxScore pruning (`:699-830`) becomes driver-coordinated
  *     candidate generation from index-time term stats: only essential
  *     posting lists and candidate docs are ever joined — the full
  *     (query-term × postings) join of the naive path never materializes.
  *
  * Filtering: `filter` is the BitsetView analog (`bitsetview.h:21-147`,
  * sparse node `sparse_index_node.cc:39-595`): a predicate over doc rows
  * applied to the postings scan before scoring. Corpus-level stats
  * (df/avgdl/max scores) stay index-time global under a filter, exactly as
  * the reference's bitset search keeps its built stats.
  *
  * Scale shape: postings are partitioned by term (the natural shuffle
  * key); the query side is small and broadcast; pruned phases reach the
  * scan as `term IN (...)` / `id IN (...)` pushed filters.
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
    * Integer products ⇒ exact double sums at any accumulation order.
    * `filter` restricts base docs (bitset analog). */
  def searchIP(
      queryPostings: DataFrame, // (qid, term, qtf)
      basePostings: DataFrame, // (id, term, tf)
      k: Int,
      filter: Option[Column] = None
  ): DataFrame = {
    val bp = filter.map(basePostings.filter).getOrElse(basePostings)
    val scored = broadcast(queryPostings)
      .join(bp, "term")
      .groupBy(col("qid"), col("id").as("nid"))
      .agg(sum(col("qtf") * col("tf")).cast("double").as("dist"))
    topK(scored, k, ascending = false)
  }

  /** Exact sparse IP range search (S2 over sparse rows): all docs with
    * score inside the similarity-direction bound radius < score <=
    * rangeFilter (`range_util.h:22-25` — IP/BM25 invert the L2 direction).
    * Output is the exploded CSR (variable rows per qid). */
  def rangeIP(
      queryPostings: DataFrame, // (qid, term, qtf)
      basePostings: DataFrame, // (id, term, tf)
      radius: Double,
      rangeFilter: Double,
      filter: Option[Column] = None
  ): DataFrame = {
    val bp = filter.map(basePostings.filter).getOrElse(basePostings)
    broadcast(queryPostings)
      .join(bp, "term")
      .groupBy(col("qid"), col("id").as("nid"))
      .agg(sum(col("qtf") * col("tf")).cast("double").as("dist"))
      .filter(col("dist") > radius && col("dist") <= rangeFilter)
  }

  /** Query-term pruning by absolute threshold: drop query terms with tf
    * below `minTf` before the join. Exact when threshold=0. */
  def pruneQueryTerms(queryPostings: DataFrame, minTf: Long): DataFrame =
    queryPostings.filter(col("qtf") >= minTf)

  /** `drop_ratio_search` quantile semantics
    * (`sparse_inverted_index.h:550-663` parse_query/get_threshold): the
    * per-query threshold is the nth-element of abs(value) at position
    * floor(dropRatio·n_terms); terms with abs(value) >= threshold are
    * KEPT — ties at the threshold all survive, and the quantile is over
    * absolute values. Exact when ratio=0. */
  def pruneQueryTermsQuantile(queryPostings: DataFrame, dropRatio: Double): DataFrame = {
    val w = Window.partitionBy(col("qid")).orderBy(col("_a").asc, col("term").asc)
    val wc = Window.partitionBy(col("qid"))
    val ranked = queryPostings
      .withColumn("_a", abs(col("qtf").cast("double")))
      .withColumn("_rn", row_number().over(w))
      .withColumn("_n", count(lit(1)).over(wc))
    val thr = ranked
      .filter(col("_rn") === floor(lit(dropRatio) * col("_n").cast("double")) + 1)
      .select(col("qid"), col("_a").as("_thr"))
    ranked
      .join(thr, Seq("qid"))
      .filter(col("_a") >= col("_thr"))
      .drop("_a", "_rn", "_n", "_thr")
  }

  /** Build-time posting prune — an EXTENSION, not a reference analog: the
    * reference's `drop_ratio_build` is deprecated and explicitly a no-op
    * (`sparse_inverted_index_config.h:28-29` "won't change anything").
    * Here it is a real knob: drop the lowest floor(ratio·n) postings of
    * each DOCUMENT by (tf asc, term asc), the build-side twin of the
    * search-side quantile prune. Exact when ratio=0. */
  def prunePostingsBuild(basePostings: DataFrame, dropRatio: Double): DataFrame = {
    val w = Window.partitionBy(col("id")).orderBy(col("tf").asc, col("term").asc)
    val wc = Window.partitionBy(col("id"))
    basePostings
      .withColumn("_rn", row_number().over(w))
      .withColumn("_n", count(lit(1)).over(wc))
      .filter(col("_rn") > floor(lit(dropRatio) * col("_n").cast("double")))
      .drop("_rn", "_n")
  }

  /** Sparse AnnIterator page (V6 × S9 — `index_node.h:451-576` applied to
    * the sparse node, `sparse_index_node.cc` AnnIterator): the per-query
    * decreasing-score stream consumed as rank-range pages; page p
    * (1-based) of size `pageSize` is ranks ((p−1)·size, p·size]. Exact
    * deterministic ranking, so pagination is resumable by construction. */
  def annIteratorPage(
      queryPostings: DataFrame,
      basePostings: DataFrame,
      page: Int,
      pageSize: Int
  ): DataFrame =
    searchIP(queryPostings, basePostings, page * pageSize)
      .filter(col("rnk") > (page - 1) * pageSize)

  /** Sparse AnnIterator REFINE (`iterator_refine_ratio` /
    * `retain_iterator_order`, `config.h:602-612`; refine loop
    * `index_node.h:538-567` over the sparse node's iterator, which opens
    * on drop_ratio-approximated scores): the candidate stream is ranked by
    * the PRUNED query's scores (quantile `drop_ratio_search` semantics),
    * page p is over-fetched by `refineRatio` from that approx order,
    * exact-rescored with the FULL query, and emitted in exact order.
    * Every approx candidate shares a term with the full query (pruned
    * terms ⊆ query terms), so the rescore preserves the window. */
  /** Materialize an over-fetched refine window ONCE as a local frame —
    * it is nq·page·pageSize·refineRatio rows by construction (tiny), and
    * it feeds TWO consumers (the doc-set scan prune and the (qid, nid)
    * gate). Catalyst's ReusedExchange often dedups the lineage today,
    * but that reuse is plan-shape-dependent; the explicit bounded
    * collect (the probeAndPrune pattern) guarantees the approx search
    * runs exactly once and both consumers become local broadcasts. */
  private def localizeWindow(window: DataFrame): DataFrame = {
    val spark = window.sparkSession
    val rows = window.collect()
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), window.schema)
  }

  def annIteratorRefinedPage(
      queryPostings: DataFrame, // (qid, term, qtf)
      basePostings: DataFrame, // (id, term, tf)
      dropRatio: Double,
      page: Int,
      pageSize: Int,
      refineRatio: Int = 2
  ): DataFrame = {
    val window = localizeWindow(searchIP(
      pruneQueryTermsQuantile(queryPostings, dropRatio),
      basePostings, page * pageSize * refineRatio)
      .select(col("qid"), col("nid")))
    // the rescore touches only window docs: prune the postings scan to the
    // (tiny, broadcast) window doc set BEFORE the term join — a superset
    // filter, the per-(qid, nid) window semi-join below stays the gate
    val winDocs = window.select(col("nid")).distinct()
    val exact = broadcast(queryPostings)
      .join(basePostings.withColumnRenamed("id", "nid")
        .join(broadcast(winDocs), Seq("nid"), "left_semi"), "term")
      .join(broadcast(window), Seq("qid", "nid"), "left_semi")
      .groupBy(col("qid"), col("nid"))
      .agg(sum(col("qtf") * col("tf")).cast("double").as("dist"))
    val w = Window.partitionBy(col("qid")).orderBy(col("dist").desc, col("nid").asc)
    exact
      .withColumn("rnk", row_number().over(w).cast("int"))
      .filter(col("rnk") > (page - 1) * pageSize && col("rnk") <= page * pageSize)
  }

  /** BM25 twin of [[annIteratorRefinedPage]] — the iterator refine knobs
    * apply to the sparse node under BM25 scoring too
    * (`sparse_index_node.cc` AnnIterator serves both metrics;
    * `config.h:602-612` refine knobs): approx stream = BM25 of the
    * quantile-pruned query, page over-fetched ×`refineRatio`, exact
    * full-query BM25 rescoring, exact-ordered emission. */
  def annIteratorRefinedPageBM25(
      queryPostings: DataFrame, // (qid, term, qtf)
      model: SparseIndexModel,
      dropRatio: Double,
      page: Int,
      pageSize: Int,
      refineRatio: Int = 2,
      roundDist: Option[Int] = Some(4)
  ): DataFrame = {
    val window = localizeWindow(searchBM25(
      pruneQueryTermsQuantile(queryPostings, dropRatio),
      model, page * pageSize * refineRatio, roundDist)
      .select(col("qid"), col("nid")))
    // postings pruned to the broadcast window doc set before the term join
    // (superset filter; the (qid, nid) semi-join below remains the gate)
    val winDocs = window.select(col("nid").as("id")).distinct()
    val scored = broadcast(queryWithIdf(queryPostings, model))
      .join(model.postings.join(broadcast(winDocs), Seq("id"), "left_semi"), "term")
      .groupBy(col("qid"), col("id").as("nid"))
      .agg((sum(bm25ContribScaledPre(model.avgdl, model.k1, model.b))
        .cast("double") / 1e9d).as("raw"))
      .join(broadcast(window), Seq("qid", "nid"), "left_semi")
    val d = roundDist.map(r => round(col("raw"), r)).getOrElse(col("raw"))
    val w = Window.partitionBy(col("qid")).orderBy(col("dist").desc, col("nid").asc)
    scored
      .select(col("qid"), col("nid"), d.as("dist"))
      .withColumn("rnk", row_number().over(w).cast("int"))
      .filter(col("rnk") > (page - 1) * pageSize && col("rnk") <= page * pageSize)
  }

  /** Sparse GetVectorByIds (`sparse_index_node.cc` raw-data fetch, tested
    * `test_sparse.cc` CC GetVectorByIds): reassemble each requested doc's
    * sparse row as term-sorted parallel arrays. */
  def getVectorByIds(ids: DataFrame, basePostings: DataFrame): DataFrame =
    basePostings
      .join(broadcast(ids), Seq("id"), "left_semi")
      .groupBy(col("id"))
      .agg(array_sort(collect_list(struct(col("term"), col("tf")))).as("_s"))
      .select(
        col("id"),
        transform(col("_s"), e => e.getField("term")).as("terms"),
        transform(col("_s"), e => e.getField("tf")).as("tfs"))

  /** BM25 exact top-k over a built index (S16): score = Σ_t qtf · idf(t) ·
    * tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl)), idf = ln((N−df+0.5)/(df+0.5)+1).
    * Per-term contributions are scaled by 1e9, rounded, and summed as LONG
    * — an exact integer sum, accumulation-order-independent (oracle
    * parity). Overflow headroom: contributions ≲ 1e3 → ≲ 1e12 scaled;
    * 9.2e18 Long capacity allows millions of shared terms per pair.
    *
    * One pass: postings already carry `dl`; df arrives via the
    * query-term-restricted slice of termStats (tiny, broadcast) — no
    * corpus-wide df or doc-length join at search time. */
  /** Query side with the per-term idf folded in: (qid, term, qtf, _idf).
    * idf depends only on (N, df) — computing it ONCE per query term here
    * (same `bm25IdfExpr` the inline form evaluated) instead of per
    * (query-term × posting) joined row drops a log() per row AND halves
    * the broadcast-hash probes (one joined frame instead of qp + stats).
    * The contribution expression keeps the exact multiply association
    * ((qtf·idf)·tfw)·1e9, so the scaled-long sums are bit-identical. */
  private def queryWithIdf(queryPostings: DataFrame, model: SparseIndexModel): DataFrame =
    queryPostings.join(
      model.termStats.select(col("term"), bm25IdfExpr(model.n).as("_idf")),
      "term")

  /** Scaled-integer BM25 contribution with the idf pre-folded (`_idf`). */
  private def bm25ContribScaledPre(avgdl: Double, k1: Double, b: Double): Column =
    round(col("qtf").cast("double") * col("_idf") * bm25TfwExpr(avgdl, k1, b) * 1e9d, 0)
      .cast("long")

  def searchBM25(
      queryPostings: DataFrame, // (qid, term, qtf)
      model: SparseIndexModel,
      k: Int,
      roundDist: Option[Int] = Some(4),
      filter: Option[Column] = None
  ): DataFrame = {
    val bp = filter.map(model.postings.filter).getOrElse(model.postings)
    val scored = broadcast(queryWithIdf(queryPostings, model))
      .join(bp, "term")
      .groupBy(col("qid"), col("id").as("nid"))
      .agg((sum(bm25ContribScaledPre(model.avgdl, model.k1, model.b)).cast("double") / 1e9d).as("raw"))
    val d = roundDist.map(r => round(col("raw"), r)).getOrElse(col("raw"))
    topK(scored.select(col("qid"), col("nid"), d.as("dist")), k, ascending = false)
  }

  /** BM25 range search (S2 × S16 — `range_search` under the BM25
    * DocValueComputer, `brute_force.cc` sparse range + `sparse_utils.h:
    * 62-66`): similarity bound direction, radius < score ≤ rangeFilter.
    * Same one-pass scoring as [[searchBM25]], no k-limit. */
  def rangeBM25(
      queryPostings: DataFrame, // (qid, term, qtf)
      model: SparseIndexModel,
      radius: Double,
      rangeFilter: Double,
      roundDist: Option[Int] = Some(4),
      filter: Option[Column] = None
  ): DataFrame = {
    val bp = filter.map(model.postings.filter).getOrElse(model.postings)
    val scored = broadcast(queryWithIdf(queryPostings, model))
      .join(bp, "term")
      .groupBy(col("qid"), col("id").as("nid"))
      .agg((sum(bm25ContribScaledPre(model.avgdl, model.k1, model.b)).cast("double") / 1e9d).as("raw"))
    val d = roundDist.map(r => round(col("raw"), r)).getOrElse(col("raw"))
    scored
      .select(col("qid"), col("nid"), d.as("dist"))
      .filter(col("dist") > radius && col("dist") <= rangeFilter)
  }

  /** Back-compat facade over raw postings + doc lengths. */
  def searchBM25(
      queryPostings: DataFrame,
      basePostings: DataFrame,
      docLens: DataFrame,
      k: Int
  ): DataFrame = {
    val joined = basePostings.join(docLens.withColumnRenamed("id", "_did"),
      col("id") === col("_did")).select(col("term"), col("id"), col("tf"), col("dl"))
    val stats = joined.groupBy(col("term"))
      .agg(count(lit(1)).as("df"), max(col("tf")).as("max_tf"), min(col("tf")).as("min_tf"))
    def corpus: (Long, Double) = {
      val Row(nDocs: Long, sumDl: Double) =
        docLens.agg(count(lit(1)), sum(col("dl")).cast("double")).head()
      (nDocs, sumDl / nDocs)
    }
    searchBM25(queryPostings, new SparseIndexModel(joined, stats, corpus, 1.2, 0.75), k)
  }

  /** BM25 idf term (needs `df`) — exposed so the serving scorer collects
    * the SAME Spark-computed double the batch path multiplies. */
  private[operators] def bm25IdfExpr(n: Long): Column =
    log((lit(n.toDouble) - col("df").cast("double") + 0.5d) /
      (col("df").cast("double") + 0.5d) + 1.0d)

  /** BM25 tf weight (needs `tf`, `dl`) — exposed for the same reason. */
  private[operators] def bm25TfwExpr(avgdl: Double, k1: Double, b: Double): Column =
    col("tf").cast("double") * (k1 + 1.0d) /
      (col("tf").cast("double") + lit(k1) *
        (lit(1.0d - b) + lit(b / avgdl) * col("dl").cast("double")))

  /** Scaled-integer BM25 contribution of one (query-term, posting) row. */
  private def bm25ContribScaled(n: Long, avgdl: Double, k1: Double, b: Double): Column =
    round(col("qtf").cast("double") * bm25IdfExpr(n) * bm25TfwExpr(avgdl, k1, b) * 1e9d, 0)
      .cast("long")

  // ------------------------------------------------------------------
  // Driver-coordinated pruned search (DAAT_WAND / DAAT_MAXSCORE, exact).
  //
  // The reference walks posting-list cursors per doc with a pivot
  // threshold (`sparse_inverted_index.h:699-830`). The batch rendering
  // keeps the same three ingredients — index-time per-term upper bounds,
  // a seed threshold θ from one posting list, the essential/non-essential
  // split — but coordinates them from the driver so each phase reaches
  // the postings scan as a pushed `term IN (...)` / `id IN (...)` filter:
  //
  //   1. UB(q,t) = qtf·max(t) from termStats — tiny, collected once;
  //      the query's (qid, term, qtf) triples and their term stats then
  //      live on the driver, so later phases broadcast LOCAL frames and
  //      never re-derive the query side from its source scan;
  //   2. θ(q)    = k-th best EXACT score among the top-UB term's top-k
  //                postings (−∞ if that list holds < k docs);
  //   3. essential terms = the suffix (by ascending UB) whose running
  //                ΣUB ≥ θ — a doc holding only prefix terms scores
  //                ≤ Σ prefix UB < θ and cannot enter the top-k;
  //   4. candidates = docs holding ≥1 essential term; only THEIR
  //                postings are joined and exactly scored.
  //
  // Admissible at every step, so the output is IDENTICAL to the naive
  // path — gated by the same oracle. The naive path's full
  // (query-term × postings) join never materializes: phases touch one
  // posting list, ≤ nq·k doc ids, then essential lists ∪ candidates.
  // ------------------------------------------------------------------

  /** Per-query term metadata assembled driver-side. `term` keeps its
    * ORIGINAL Spark type (string tokens or numeric dims — the reference's
    * sparse dims are uint32); `key` is a stable string rendering used only
    * for deterministic tie-breaks. Scoring sums treat qtf as DOUBLE
    * (exact for integer-valued weights ≲ 2^53, which is also what the
    * naive path's long sums produce). */
  private final case class QTerm(term: Any, key: String, qtf: Double, ub: Double, df: Long)

  private final case class QueryPlan(
      byQid: Map[Long, Array[QTerm]],
      termType: org.apache.spark.sql.types.DataType
  ) {
    def allTerms: Seq[Any] =
      byQid.valuesIterator.flatten.map(_.term).toSeq.distinct
    def dfByKey: Map[String, Long] =
      byQid.valuesIterator.flatten.map(t => (t.key, t.df)).toMap
  }

  /** Local (driver-built) frame with a term column of the plan's type. */
  private def localDf(
      spark: SparkSession,
      plan: QueryPlan,
      rows: Seq[org.apache.spark.sql.Row],
      fields: Seq[(String, org.apache.spark.sql.types.DataType)]
  ): DataFrame = {
    import org.apache.spark.sql.types.{StructField, StructType}
    spark.createDataFrame(
      java.util.Arrays.asList(rows: _*),
      StructType(fields.map { case (n, t) => StructField(n, t) }))
  }

  import org.apache.spark.sql.types.{DoubleType, LongType}
  import org.apache.spark.sql.{Row => SqlRow}

  /** How many distinct terms a pushed `term IN (...)` literal may carry.
    * Above this, the restriction becomes a broadcast left-semi join on a
    * local term frame — a huge IN literal blows up the expression tree /
    * codegen long before driver memory does, while a semi-join against a
    * broadcast hash of the same terms stays flat. */
  private val InLiteralMaxTerms = 10000

  /** Restrict postings to a term set: pushed `IN` literal when small (it
    * reaches the scan as a data-skipping filter), broadcast semi-join
    * above [[InLiteralMaxTerms]]. */
  private def restrictToTerms(
      spark: SparkSession,
      bp: DataFrame,
      plan: QueryPlan,
      terms: Seq[Any]
  ): DataFrame =
    if (terms.length <= InLiteralMaxTerms) bp.filter(col("term").isInCollection(terms))
    else
      bp.join(
        broadcast(localDf(spark, plan, terms.map(t => SqlRow(t)),
          Seq("term" -> plan.termType))),
        Seq("term"), "left_semi")

  /** (qid, term, qtf) local frame — phases broadcast this instead of
    * re-deriving the query side from its source scan. */
  private def localQpDf(spark: SparkSession, plan: QueryPlan): DataFrame =
    localDf(spark, plan,
      plan.byQid.toSeq.flatMap { case (qid, ts) => ts.map(t => SqlRow(qid, t.term, t.qtf)) },
      Seq("qid" -> LongType, "term" -> plan.termType, "qtf" -> DoubleType))

  /** (term, df) local frame, query-term-restricted. */
  private def localStatsDf(spark: SparkSession, plan: QueryPlan): DataFrame =
    localDf(spark, plan,
      plan.byQid.valuesIterator.flatten.map(t => (t.key, (t.term, t.df))).toMap
        .values.toSeq.map { case (term, df) => SqlRow(term, df) },
      Seq("term" -> plan.termType, "df" -> LongType))

  /** One job: restrict termStats to the query's terms, compute UBs, pull
    * the (tiny) result to the driver. */
  private def planQueries(
      queryPostings: DataFrame,
      termStats: DataFrame,
      ubCol: Column
  ): QueryPlan = {
    val termType = queryPostings.schema("term").dataType
    val rows = termStats
      .join(broadcast(queryPostings), "term")
      .select(col("qid").cast("long"), col("term"), col("qtf").cast("double"),
        ubCol.cast("double").as("ub"), col("min_tf").cast("double"), col("df").cast("long"))
      .collect()
    require(rows.length <= 1000000,
      "pruned sparse search: query side too large for driver coordination")
    rows.foreach { r =>
      // admissibility precondition (UB(t)=qtf·max is only an upper bound
      // for NONNEGATIVE weights) — fail loudly instead of silently
      // pruning true results
      require(r.getDouble(2) >= 0 && r.getDouble(4) >= 0,
        "WAND/MaxScore pruning requires nonnegative qtf and tf")
    }
    val byQid = rows
      .groupBy(_.getLong(0))
      .map { case (qid, rs) =>
        qid -> rs.map(r =>
          QTerm(r.get(1), String.valueOf(r.get(1)), r.getDouble(2), r.getDouble(3), r.getLong(5)))
      }
    QueryPlan(byQid, termType)
  }

  /** Seed θ per query: exact scores of the top-UB term's top-k postings.
    * ONE job: the seed top-k feeds the exact-score join as a broadcast
    * (≤ nq·k rows) instead of a collect+`id IN` round-trip — restriction
    * without a driver hop. `exactOf(bpRestricted, seedDocs)` → (qid, id,
    * dist). */
  private def seedThetas(
      spark: SparkSession,
      bp: DataFrame,
      plan: QueryPlan,
      k: Int,
      exactOf: (DataFrame, DataFrame) => DataFrame
  ): Map[Long, Double] = {
    // top-UB terms per query (ties by term asc, like the cursor
    // ordering). Seeding from the top THREE lists instead of one keeps θ
    // meaningful when the best-bound term's posting list holds fewer than
    // k docs (common under idf-style weighting, where the top-UB term is
    // rare) — any exactly-scored candidate subset yields an admissible θ,
    // and a larger subset only tightens it.
    val topTerms = plan.byQid.toSeq.flatMap { case (qid, ts) =>
      ts.sortBy(t => (-t.ub, t.key)).take(3).map(t => (qid, t))
    }
    val topTermDf = localDf(spark, plan,
      topTerms.map { case (qid, t) => SqlRow(qid, t.term, t.qtf) },
      Seq("qid" -> LongType, "term" -> plan.termType, "qtf" -> DoubleType))
    val seedPairs = restrictToTerms(spark, bp, plan, topTerms.map(_._2.term).distinct)
      .join(broadcast(topTermDf), "term")
      .select(col("qid"), col("id").as("nid"),
        (col("qtf") * col("tf")).cast("double").as("dist"))
    val seeds = topK(seedPairs, k, ascending = false)
      .select(col("qid"), col("nid").as("id"))
    val exact = exactOf(
      bp.join(broadcast(seeds.select(col("id")).distinct()), Seq("id"), "left_semi"),
      broadcast(seeds))
      .collect()
      .map(r => (r.getLong(0), r.getDouble(2)))
    val scoresByQid = exact.groupBy(_._1)
    plan.byQid.map { case (qid, _) =>
      val ss = scoresByQid.getOrElse(qid, Array.empty).map(_._2).sortBy(-_)
      qid -> (if (ss.length >= k) ss(k - 1) else Double.MinValue)
    }
  }

  /** Essential (qid, QTerm) rows: suffix by ascending UB whose running
    * ΣUB ≥ θ − slack. */
  private def essentialTerms(
      plan: QueryPlan,
      thetas: Map[Long, Double],
      slack: Double
  ): Seq[(Long, QTerm)] =
    plan.byQid.toSeq.flatMap { case (qid, ts) =>
      val theta = thetas(qid)
      val sorted = ts.sortBy(t => (t.ub, t.key))
      var cum = 0.0
      sorted.flatMap { t =>
        cum += t.ub
        if (cum >= theta - slack) Some((qid, t)) else None
      }
    }

  /** Candidate (qid, id) pairs: docs holding ≥1 essential term, from a
    * scan pruned to the essential posting lists. */
  private def candidatesOf(
      spark: SparkSession,
      bp: DataFrame,
      plan: QueryPlan,
      essential: Seq[(Long, QTerm)]
  ): DataFrame = {
    val essDf = broadcast(localDf(spark, plan,
      essential.map { case (qid, t) => SqlRow(qid, t.term) },
      Seq("qid" -> LongType, "term" -> plan.termType)))
    restrictToTerms(spark, bp, plan, essential.map(_._2.term).distinct)
      .join(essDf, "term")
      .select(col("qid"), col("id"))
      .dropDuplicates("qid", "id")
  }

  /** Cost-based fallback (the reference's conditional-wrapper pattern,
    * `IndexConditionalWrapper.cc:34-95`, applied to DAAT pruning): the
    * candidate machinery pays only when essential posting lists are a
    * SMALL fraction of the query's postings; on degenerate vocabularies
    * or weak bounds, score-all is exact and cheaper. Decided driver-side
    * from the already-collected per-term df stats, no extra job. Either
    * branch returns the identical exact result. */
  private def pruneWontPay(
      plan: QueryPlan,
      essential: Seq[(Long, QTerm)],
      fallbackRatio: Double = 0.05
  ): Boolean = {
    val essDf = essential.iterator.map(_._2.df.toDouble).sum
    val allDf = plan.byQid.valuesIterator.flatten.map(_.df.toDouble).sum
    essDf >= fallbackRatio * allDf
  }

  /** Driver-side cost probe run BEFORE any seeding job: each query's
    * top-UB posting list is always essential (the suffix rule keeps it),
    * so Σ_q df(top-UB term) lower-bounds the essential df mass. When that
    * bound alone crosses the fallback threshold the candidate machinery
    * cannot pay, and the two θ-seeding actions are skipped outright —
    * this decides the degenerate-vocabulary case (every list long, bounds
    * uninformative) with ZERO extra jobs. Cost-only decision: both
    * branches return the identical exact result. */
  private def pruneCannotPay(plan: QueryPlan, fallbackRatio: Double): Boolean = {
    val lb = plan.byQid.valuesIterator
      .map(ts => ts.maxBy(t => (t.ub, t.key)).df.toDouble).sum
    val allDf = plan.byQid.valuesIterator.flatten.map(_.df.toDouble).sum
    // second criterion: pruning only pays when the top-UB list is much
    // RARER than the query's average list (on a uniform vocabulary
    // df(topUB) ≈ mean df and the bounds cannot carve out anything worth
    // the seeding actions, however many terms the query has). The factor
    // scales with fallbackRatio so the spec's >1 override disables both.
    val meanDf = plan.byQid.valuesIterator
      .map(ts => ts.iterator.map(_.df.toDouble).sum / ts.length).sum
    lb >= fallbackRatio * allDf || lb >= (10.0 * fallbackRatio) * meanDf
  }

  /** Exact IP top-k with MaxScore essential-list pruning
    * (`sparse_inverted_index.h:759-830`), driver-coordinated — see the
    * block comment above. Output identical to [[searchIP]]. */
  def searchIPMaxScore(
      queryPostings: DataFrame, // (qid, term, qtf)
      model: SparseIndexModel,
      k: Int,
      filter: Option[Column] = None,
      fallbackRatio: Double = 0.05
  ): DataFrame = {
    val spark = model.postings.sparkSession
    import spark.implicits._
    val bp = filter.map(model.postings.filter).getOrElse(model.postings)

    val plan = planQueries(queryPostings, model.termStats, col("qtf") * col("max_tf"))
    if (plan.byQid.isEmpty)
      return topK(spark.emptyDataset[(Long, Long, Double)].toDF("qid", "nid", "dist"),
        k, ascending = false)
    val qpDf = broadcast(localQpDf(spark, plan))

    def ipExact(bpR: DataFrame, docs: DataFrame): DataFrame = bpR
      .join(qpDf, "term")
      .join(docs, Seq("qid", "id"), "left_semi")
      .groupBy(col("qid").cast("long").as("qid"), col("id").cast("long").as("id"))
      .agg(sum(col("qtf") * col("tf")).cast("double").as("dist"))

    val qScan = restrictToTerms(spark, bp, plan, plan.allTerms)
    def scoreAll: DataFrame = qScan
      .join(qpDf, "term")
      .groupBy(col("qid"), col("id").as("nid"))
      .agg(sum(col("qtf") * col("tf")).cast("double").as("dist"))
    if (pruneCannotPay(plan, fallbackRatio))
      return topK(scoreAll, k, ascending = false)

    val thetas = seedThetas(spark, bp, plan, k, ipExact)
    val essential = essentialTerms(plan, thetas, slack = 0.0)
    val exact =
      if (pruneWontPay(plan, essential, fallbackRatio)) {
        // degenerate bounds: score-all restricted to query terms (exact)
        scoreAll
      } else {
        // exact scores over candidate docs only; AQE broadcasts the
        // candidate id list when small, shuffle-joins when not
        val candidates = candidatesOf(spark, bp, plan, essential)
        qScan
          .join(candidates.select(col("id")).distinct(), "id")
          .join(qpDf, "term")
          .join(candidates, Seq("qid", "id"), "left_semi")
          .groupBy(col("qid"), col("id").as("nid"))
          .agg(sum(col("qtf") * col("tf")).cast("double").as("dist"))
      }
    topK(exact, k, ascending = false)
  }

  /** Exact IP top-k with WAND-style pruning
    * (`sparse_inverted_index.h:699-757`): same stats-seeded candidate
    * generation as MaxScore, then the pivot test — per-doc UB(d) =
    * Σ_{t∈d∩Q} qtf·max_tf(t); docs with UB < θ are discarded BEFORE
    * ranking (the reference's per-posting cursor pivoting collapses to
    * this doc-level admissible bound in batch). UB ≥ exact score always,
    * and seeds survive, so output is identical to [[searchIP]]. */
  def searchIPWand(
      queryPostings: DataFrame, // (qid, term, qtf)
      model: SparseIndexModel,
      k: Int,
      filter: Option[Column] = None,
      fallbackRatio: Double = 0.05
  ): DataFrame = {
    val spark = model.postings.sparkSession
    import spark.implicits._
    val bp = filter.map(model.postings.filter).getOrElse(model.postings)

    val plan = planQueries(queryPostings, model.termStats, col("qtf") * col("max_tf"))
    if (plan.byQid.isEmpty)
      return topK(spark.emptyDataset[(Long, Long, Double)].toDF("qid", "nid", "dist"),
        k, ascending = false)
    val qpDf = broadcast(localQpDf(spark, plan))

    def ipExact(bpR: DataFrame, docs: DataFrame): DataFrame = bpR
      .join(qpDf, "term")
      .join(docs, Seq("qid", "id"), "left_semi")
      .groupBy(col("qid").cast("long").as("qid"), col("id").cast("long").as("id"))
      .agg(sum(col("qtf") * col("tf")).cast("double").as("dist"))

    val qScan = restrictToTerms(spark, bp, plan, plan.allTerms)
    def scoreAll: DataFrame = qScan
      .join(qpDf, "term")
      .groupBy(col("qid"), col("id").as("nid"))
      .agg(sum(col("qtf") * col("tf")).cast("double").as("dist"))
    if (pruneCannotPay(plan, fallbackRatio))
      return topK(scoreAll, k, ascending = false)

    val thetas = seedThetas(spark, bp, plan, k, ipExact)
    val essential = essentialTerms(plan, thetas, slack = 0.0)
    if (pruneWontPay(plan, essential, fallbackRatio)) {
      // degenerate bounds: score-all restricted to query terms (exact)
      return topK(scoreAll, k, ascending = false)
    }
    val candidates = candidatesOf(spark, bp, plan, essential)

    // one aggregation computes exact score AND the WAND doc bound; the
    // pivot test filters on the bound before ranking
    val qWithUb = broadcast(localDf(spark, plan,
      plan.byQid.toSeq.flatMap { case (qid, ts) => ts.map(t => SqlRow(qid, t.term, t.qtf, t.ub)) },
      Seq("qid" -> LongType, "term" -> plan.termType, "qtf" -> DoubleType, "ub" -> DoubleType)))
    val thetaDf = broadcast(thetas.toSeq.toDF("qid", "theta"))
    val scored = qScan
      .join(candidates.select(col("id")).distinct(), "id")
      .join(qWithUb, "term")
      .join(candidates, Seq("qid", "id"), "left_semi")
      .groupBy(col("qid"), col("id").as("nid"))
      .agg(
        sum(col("qtf") * col("tf")).cast("double").as("dist"),
        sum(col("ub")).as("_ubsum"))
    val survivors = scored
      .join(thetaDf, "qid")
      .filter(col("_ubsum") >= col("theta"))
      .select(col("qid"), col("nid"), col("dist"))
    topK(survivors, k, ascending = false)
  }

  /** BM25 under MaxScore pruning (`sparse_inverted_index.h:384-392` —
    * max-score upkeep with the BM25 ratio; `:759-830`): UB(q,t) =
    * qtf·idf(t)·max_w(t)·maxScoreRatio, where max_w is the index-time
    * max BM25 tf-weight of the term's posting list. Our avgdl is exact at
    * build (no growing-segment drift), so ratio=1.0 stays admissible; the
    * reference's `dim_max_score_ratio` (default 1.05 for BM25) is exposed
    * for parity. A 1e−3 slack on θ absorbs both the 0.5e−9-per-term
    * rounding of the scaled-integer exact scores and the final 4dp
    * round-before-rank (which moves scores by ≤ 5e−5): an excluded doc's
    * rounded score stays STRICTLY below the rounded k-th, so ties at the
    * boundary are preserved. Output identical to [[searchBM25]] — gated
    * by the same oracle. */
  def searchBM25MaxScore(
      queryPostings: DataFrame, // (qid, term, qtf)
      model: SparseIndexModel,
      k: Int,
      maxScoreRatio: Double = 1.0,
      roundDist: Option[Int] = Some(4),
      filter: Option[Column] = None,
      wandPivot: Boolean = false, // SPARSE_WAND variant: doc-level UB pivot
      fallbackRatio: Double = 0.05
  ): DataFrame = {
    require(maxScoreRatio >= 1.0, "maxScoreRatio < 1 would break admissibility")
    val spark = model.postings.sparkSession
    import spark.implicits._
    val bp = filter.map(model.postings.filter).getOrElse(model.postings)

    val idf = log((lit(model.n.toDouble) - col("df").cast("double") + 0.5d) /
      (col("df").cast("double") + 0.5d) + 1.0d)
    // stage-1 cost probe with the universal tf-weight bound max_w ≤ k1+1
    // (tfw = tf(k1+1)/(tf+k1·norm) < k1+1): needs only termStats, so the
    // degenerate-vocabulary fallback neither seeds θ nor forces the lazy
    // (persisted) bm25TermStats frame
    val plan0 = planQueries(queryPostings, model.termStats,
      col("qtf") * idf * (model.k1 + 1.0d) * maxScoreRatio)
    if (plan0.byQid.isEmpty)
      return topK(spark.emptyDataset[(Long, Long, Double)].toDF("qid", "nid", "dist"),
        k, ascending = false)
    if (pruneCannotPay(plan0, fallbackRatio)) {
      val qpDf0 = broadcast(localQpDf(spark, plan0))
      val statsDf0 = broadcast(localStatsDf(spark, plan0))
      val scored0 = restrictToTerms(spark, bp, plan0, plan0.allTerms)
        .join(qpDf0, "term")
        .join(statsDf0, "term")
        .groupBy(col("qid"), col("id").as("nid"))
        .agg((sum(bm25ContribScaled(model.n, model.avgdl, model.k1, model.b)).cast("double") / 1e9d).as("raw"))
      val d0 = roundDist.map(r => round(col("raw"), r)).getOrElse(col("raw"))
      return topK(scored0.select(col("qid"), col("nid"), d0.as("dist")), k, ascending = false)
    }
    // pruning may pay: re-plan with the index-time per-term max BM25
    // weights (max-score upkeep, sparse_inverted_index.h:384-392)
    val plan = planQueries(queryPostings,
      model.termStats.join(model.bm25TermStats, "term"),
      col("qtf") * idf * col("max_w") * maxScoreRatio)
    val qpDf = broadcast(localQpDf(spark, plan))
    val statsDf = broadcast(localStatsDf(spark, plan))

    def bm25Exact(bpR: DataFrame, docs: DataFrame): DataFrame = bpR
      .join(qpDf, "term")
      .join(statsDf, "term")
      .join(docs, Seq("qid", "id"), "left_semi")
      .groupBy(col("qid").cast("long").as("qid"), col("id").cast("long").as("id"))
      .agg((sum(bm25ContribScaled(model.n, model.avgdl, model.k1, model.b)).cast("double") / 1e9d).as("dist"))

    val thetas = seedThetas(spark, bp, plan, k, bm25Exact)
    val essential = essentialTerms(plan, thetas, slack = 1e-3)
    if (wandPivot && !pruneWontPay(plan, essential, fallbackRatio)) {
      // SPARSE_WAND × BM25: the doc-level pivot bound rides the same
      // UB(q,t) rows; admissible with the same 1e-3 rounding slack
      val qWithUb = broadcast(localDf(spark, plan,
        plan.byQid.toSeq.flatMap { case (qid, ts) => ts.map(t => SqlRow(qid, t.term, t.qtf, t.ub)) },
        Seq("qid" -> LongType, "term" -> plan.termType, "qtf" -> DoubleType, "ub" -> DoubleType)))
      val thetaDf = broadcast(thetas.toSeq.toDF("qid", "theta"))

      val candidates = candidatesOf(spark, bp, plan, essential)
      val scored = restrictToTerms(spark, bp, plan, plan.allTerms)
        .join(candidates.select(col("id")).distinct(), "id")
        .join(qWithUb, "term")
        .join(statsDf, "term")
        .join(candidates, Seq("qid", "id"), "left_semi")
        .groupBy(col("qid"), col("id").as("nid"))
        .agg(
          (sum(bm25ContribScaled(model.n, model.avgdl, model.k1, model.b)).cast("double") / 1e9d).as("raw"),
          sum(col("ub")).as("_ubsum"))
      val survivors = scored
        .join(thetaDf, "qid")
        .filter(col("_ubsum") >= col("theta") - 1e-3)
        .select(col("qid"), col("nid"), col("raw"))
      val d = roundDist.map(r => round(col("raw"), r)).getOrElse(col("raw"))
      return topK(survivors.select(col("qid"), col("nid"), d.as("dist")), k, ascending = false)
    }
    val qScan = restrictToTerms(spark, bp, plan, plan.allTerms)
    val scored =
      if (pruneWontPay(plan, essential, fallbackRatio)) {
        // degenerate bounds: score-all restricted to query terms (exact)
        qScan
          .join(qpDf, "term")
          .join(statsDf, "term")
          .groupBy(col("qid"), col("id").as("nid"))
          .agg((sum(bm25ContribScaled(model.n, model.avgdl, model.k1, model.b)).cast("double") / 1e9d).as("raw"))
      } else {
        val candidates = candidatesOf(spark, bp, plan, essential)
        qScan
          .join(candidates.select(col("id")).distinct(), "id")
          .join(qpDf, "term")
          .join(statsDf, "term")
          .join(candidates, Seq("qid", "id"), "left_semi")
          .groupBy(col("qid"), col("id").as("nid"))
          .agg((sum(bm25ContribScaled(model.n, model.avgdl, model.k1, model.b)).cast("double") / 1e9d).as("raw"))
      }
    val d = roundDist.map(r => round(col("raw"), r)).getOrElse(col("raw"))
    topK(scored.select(col("qid"), col("nid"), d.as("dist")), k, ascending = false)
  }
}
