package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.{SparseIndexModel, SparseSearch}
import graft.sources.Tables

/** Sparse vector search over the documents corpus: term-frequency postings
  * as the sparse representation (S3 brute-force sparse, S9 inverted index,
  * S16 BM25). Query rows = every 100th document's tf vector.
  *
  * The pruned paths (WAND / MaxScore, IP and BM25) are exact — provably
  * identical output to the score-all path — so they share the naive
  * oracle verbatim: the hash match IS the exactness proof.
  */
object SparseQueries {

  private val QMOD = 100
  private val K = 10

  private def basePostings(s: org.apache.spark.sql.SparkSession, dir: String) =
    SparseSearch.postings(Tables.documents(s, dir), "doc_id", "text")

  private[queries] def model(s: org.apache.spark.sql.SparkSession, dir: String) =
    SparseIndexModel.build(Tables.documents(s, dir), "doc_id", "text")

  private[queries] def queryPostings(s: org.apache.spark.sql.SparkSession, dir: String) =
    SparseSearch
      .postings(
        Tables.documents(s, dir).filter(col("doc_id") % QMOD === 0),
        "doc_id",
        "text")
      .select(col("id").as("qid"), col("term"), col("tf").as("qtf"))

  private val tfCte =
    """tf AS (
  SELECT doc_id, term, count(*) AS tf
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
  GROUP BY 1, 2
),
q AS (SELECT doc_id AS qid, term, tf AS qtf FROM tf WHERE doc_id % 100 = 0)"""

  /** Naive sparse-IP top-k oracle, with an optional base-side predicate. */
  private def ipOracle(where: String = ""): String =
    s"""WITH $tfCte,
scored AS (
  SELECT q.qid AS qid, t.doc_id AS nid, CAST(sum(q.qtf * t.tf) AS DOUBLE) AS dist
  FROM q JOIN tf t ON q.term = t.term $where GROUP BY 1, 2
)
SELECT qid, nid, dist, rnk FROM (
  SELECT qid, nid, dist,
         CAST(row_number() OVER (PARTITION BY qid ORDER BY dist DESC, nid ASC) AS INT) AS rnk
  FROM scored
) WHERE rnk <= $K"""

  /** BM25 scored-pairs CTE (shared by top-k, pruned, and range). */
  private[queries] val bm25ScoredCte =
    s"""WITH $tfCte,
dl AS (SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents),
s AS (SELECT CAST(count(*) AS DOUBLE) AS n,
             CAST(sum(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl FROM dl),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
scored AS (
  SELECT q.qid AS qid, t.doc_id AS nid,
    round(CAST(sum(CAST(round(
      (q.qtf * ln(((s.n - df.df) + 0.5) / (df.df + 0.5) + 1.0)) *
      ((t.tf * (1.2 + 1.0)) / (t.tf + 1.2 * ((1.0 - 0.75) + (0.75 / s.avgdl) * dl.dl)))
      * 1000000000.0, 0) AS BIGINT)) AS DOUBLE) / 1000000000.0, 4) AS dist
  FROM q
  JOIN tf t ON q.term = t.term
  JOIN df ON df.term = t.term
  JOIN dl ON dl.doc_id = t.doc_id
  CROSS JOIN s
  GROUP BY 1, 2
)"""

  /** Plain BM25 top-k oracle (shared by the pruned BM25 paths). */
  private val bm25Oracle =
    s"""$bm25ScoredCte
SELECT qid, nid, dist, rnk FROM (
  SELECT qid, nid, dist,
         CAST(row_number() OVER (PARTITION BY qid ORDER BY dist DESC, nid ASC) AS INT) AS rnk
  FROM scored
) WHERE rnk <= $K"""

  def all: Seq[GraftQuery] = Seq(
    // S3/S9 — exact sparse IP top-k via postings join (integer products ⇒
    // order-independent exact sums)
    GraftQuery(
      "sparse_ip_knn",
      (s, dir) => SparseSearch.searchIP(queryPostings(s, dir), basePostings(s, dir), K),
      Some(ipOracle())),
    // S9 + BitsetView — sparse FILTERED search (sparse_index_node.cc:39-595,
    // tests/ut/test_sparse.cc:36-577): predicate over base docs applied to
    // the postings scan before scoring
    GraftQuery(
      "sparse_ip_knn_filtered",
      (s, dir) =>
        SparseSearch.searchIP(queryPostings(s, dir), basePostings(s, dir), K,
          filter = Some(col("id") % 3 =!= 0)),
      Some(ipOracle(where = "AND t.doc_id % 3 <> 0"))),
    // S9 — DAAT_WAND, exact mode: stats-seeded candidates + doc-level
    // pivot bound (sparse_inverted_index.h:699-757)
    GraftQuery(
      "sparse_ip_wand_knn",
      (s, dir) => {
        val m = model(s, dir)
        SparseSearch.searchIPWand(queryPostings(s, dir), m, K)
      },
      Some(ipOracle())),
    // S9 — DAAT_MAXSCORE, exact mode: essential-list split prunes the
    // postings join itself (sparse_inverted_index.h:759-830)
    GraftQuery(
      "sparse_ip_maxscore_knn",
      (s, dir) => {
        val m = model(s, dir)
        SparseSearch.searchIPMaxScore(queryPostings(s, dir), m, K)
      },
      Some(ipOracle())),
    // S2 × S9 — sparse range search: similarity-direction two-sided bound
    // radius < score <= rangeFilter (range_util.h:22-25); exploded CSR out
    GraftQuery(
      "sparse_ip_range",
      (s, dir) =>
        SparseSearch.rangeIP(queryPostings(s, dir), basePostings(s, dir),
          radius = 220.0, rangeFilter = 1e9),
      Some(s"""WITH $tfCte
SELECT qid, nid, dist FROM (
  SELECT q.qid AS qid, t.doc_id AS nid, CAST(sum(q.qtf * t.tf) AS DOUBLE) AS dist
  FROM q JOIN tf t ON q.term = t.term GROUP BY 1, 2
) WHERE dist > 220.0 AND dist <= 1000000000.0""")),
    // S2 × S16 — BM25 RANGE search: the similarity-direction two-sided
    // bound over BM25 scores (range search under the BM25 value computer)
    GraftQuery(
      "sparse_bm25_range",
      (s, dir) => {
        val m = model(s, dir)
        SparseSearch.rangeBM25(queryPostings(s, dir), m, radius = 12.0, rangeFilter = 1e9)
      },
      Some(s"""$bm25ScoredCte
SELECT qid, nid, dist FROM scored
WHERE dist > 12.0 AND dist <= 1000000000.0""")),
    // S9 drop_ratio_search, absolute-threshold analog: terms with qtf below
    // a fixed threshold are dropped from the QUERY (not the index)
    GraftQuery(
      "sparse_ip_drop_knn",
      (s, dir) =>
        SparseSearch.searchIP(
          SparseSearch.pruneQueryTerms(queryPostings(s, dir), minTf = 3L),
          basePostings(s, dir),
          K),
      Some(s"""WITH $tfCte,
scored AS (
  SELECT q.qid AS qid, t.doc_id AS nid, CAST(sum(q.qtf * t.tf) AS DOUBLE) AS dist
  FROM q JOIN tf t ON q.term = t.term AND q.qtf >= 3 GROUP BY 1, 2
)
SELECT qid, nid, dist, rnk FROM (
  SELECT qid, nid, dist,
         CAST(row_number() OVER (PARTITION BY qid ORDER BY dist DESC, nid ASC) AS INT) AS rnk
  FROM scored
) WHERE rnk <= $K""")),
    // S9 drop_ratio_search QUANTILE semantics (sparse_inverted_index.h:
    // 550-663 parse_query/get_threshold): threshold = nth-element of
    // abs(value) at floor(ratio·n); keep abs(value) >= threshold, ties
    // at the threshold all survive — the reference's actual knob
    GraftQuery(
      "sparse_ip_dropq_knn",
      (s, dir) =>
        SparseSearch.searchIP(
          SparseSearch.pruneQueryTermsQuantile(queryPostings(s, dir), dropRatio = 0.3),
          basePostings(s, dir),
          K),
      Some(s"""WITH $tfCte,
qr AS (
  SELECT qid, term, qtf, abs(CAST(qtf AS DOUBLE)) AS a,
         row_number() OVER (PARTITION BY qid ORDER BY abs(CAST(qtf AS DOUBLE)) ASC, term ASC) AS rn,
         count(*) OVER (PARTITION BY qid) AS nt
  FROM q
),
thr AS (SELECT qid, a AS th FROM qr WHERE rn = floor(CAST(0.3 AS DOUBLE) * CAST(nt AS DOUBLE)) + 1),
qd AS (SELECT qr.qid, qr.term, qr.qtf FROM qr JOIN thr ON qr.qid = thr.qid WHERE qr.a >= thr.th),
scored AS (
  SELECT qd.qid AS qid, t.doc_id AS nid, CAST(sum(qd.qtf * t.tf) AS DOUBLE) AS dist
  FROM qd JOIN tf t ON qd.term = t.term GROUP BY 1, 2
)
SELECT qid, nid, dist, rnk FROM (
  SELECT qid, nid, dist,
         CAST(row_number() OVER (PARTITION BY qid ORDER BY dist DESC, nid ASC) AS INT) AS rnk
  FROM scored
) WHERE rnk <= $K""")),
    // S9 build-side prune — an extension (the reference's drop_ratio_build
    // is deprecated/no-op, sparse_inverted_index_config.h:28-29): each doc
    // drops its lowest 20% of postings before indexing; search over the
    // pruned index
    GraftQuery(
      "sparse_ip_dropb_knn",
      (s, dir) =>
        SparseSearch.searchIP(
          queryPostings(s, dir),
          SparseSearch.prunePostingsBuild(basePostings(s, dir), dropRatio = 0.2),
          K),
      Some(s"""WITH $tfCte,
tr AS (
  SELECT doc_id, term, tf,
         row_number() OVER (PARTITION BY doc_id ORDER BY tf ASC, term ASC) AS rn,
         count(*) OVER (PARTITION BY doc_id) AS nt
  FROM tf
),
td AS (SELECT doc_id, term, tf FROM tr WHERE rn > floor(CAST(0.2 AS DOUBLE) * CAST(nt AS DOUBLE))),
scored AS (
  SELECT q.qid AS qid, t.doc_id AS nid, CAST(sum(q.qtf * t.tf) AS DOUBLE) AS dist
  FROM q JOIN td t ON q.term = t.term GROUP BY 1, 2
)
SELECT qid, nid, dist, rnk FROM (
  SELECT qid, nid, dist,
         CAST(row_number() OVER (PARTITION BY qid ORDER BY dist DESC, nid ASC) AS INT) AS rnk
  FROM scored
) WHERE rnk <= $K""")),
    // V6 × S9 — sparse AnnIterator: page 2 of the decreasing-IP stream
    GraftQuery(
      "sparse_iter_page2",
      (s, dir) =>
        SparseSearch.annIteratorPage(queryPostings(s, dir), basePostings(s, dir),
          page = 2, pageSize = 10),
      Some(s"""WITH $tfCte,
scored AS (
  SELECT q.qid AS qid, t.doc_id AS nid, CAST(sum(q.qtf * t.tf) AS DOUBLE) AS dist
  FROM q JOIN tf t ON q.term = t.term GROUP BY 1, 2
)
SELECT qid, nid, dist, rnk FROM (
  SELECT qid, nid, dist,
         CAST(row_number() OVER (PARTITION BY qid ORDER BY dist DESC, nid ASC) AS INT) AS rnk
  FROM scored
) WHERE rnk > 10 AND rnk <= 20""")),
    // V6 × S9 — sparse iterator REFINE: stream opened on drop_ratio(0.3)-
    // approximated scores, page 2 over-fetched 2×, exact-rescored with the
    // full query, emitted in exact order (config.h:602-612 refine knobs
    // over the sparse iterator)
    GraftQuery(
      "sparse_iter_refine_page2",
      (s, dir) =>
        SparseSearch.annIteratorRefinedPage(queryPostings(s, dir), basePostings(s, dir),
          dropRatio = 0.3, page = 2, pageSize = 10, refineRatio = 2),
      Some(s"""WITH $tfCte,
qr AS (
  SELECT qid, term, qtf, abs(CAST(qtf AS DOUBLE)) AS a,
         row_number() OVER (PARTITION BY qid ORDER BY abs(CAST(qtf AS DOUBLE)) ASC, term ASC) AS rn,
         count(*) OVER (PARTITION BY qid) AS nt
  FROM q
),
thr AS (SELECT qid, a AS th FROM qr WHERE rn = floor(CAST(0.3 AS DOUBLE) * CAST(nt AS DOUBLE)) + 1),
qd AS (SELECT qr.qid, qr.term, qr.qtf FROM qr JOIN thr ON qr.qid = thr.qid WHERE qr.a >= thr.th),
ascored AS (
  SELECT qd.qid AS qid, t.doc_id AS nid, CAST(sum(qd.qtf * t.tf) AS DOUBLE) AS dist
  FROM qd JOIN tf t ON qd.term = t.term GROUP BY 1, 2
),
win AS (
  SELECT qid, nid FROM (
    SELECT qid, nid, row_number() OVER (PARTITION BY qid ORDER BY dist DESC, nid ASC) AS rn
    FROM ascored
  ) WHERE rn <= 40
),
exact AS (
  SELECT q.qid AS qid, t.doc_id AS nid, CAST(sum(q.qtf * t.tf) AS DOUBLE) AS dist
  FROM q JOIN tf t ON q.term = t.term
  JOIN win w ON w.qid = q.qid AND w.nid = t.doc_id
  GROUP BY 1, 2
)
SELECT qid, nid, dist, rnk FROM (
  SELECT qid, nid, dist,
         CAST(row_number() OVER (PARTITION BY qid ORDER BY dist DESC, nid ASC) AS INT) AS rnk
  FROM exact
) WHERE rnk > 10 AND rnk <= 20""")),
    // V6 × S16 — the iterator page under BM25 scoring (the reference's
    // sparse iterator serves BM25 too, sparse_index_node.cc AnnIterator)
    GraftQuery(
      "sparse_bm25_iter_page2",
      (s, dir) => {
        val m = model(s, dir)
        SparseSearch.searchBM25(queryPostings(s, dir), m, 20)
          .filter(col("rnk") > 10)
      },
      Some(s"""$bm25ScoredCte
SELECT qid, nid, dist, rnk FROM (
  SELECT qid, nid, dist,
         CAST(row_number() OVER (PARTITION BY qid ORDER BY dist DESC, nid ASC) AS INT) AS rnk
  FROM scored
) WHERE rnk > 10 AND rnk <= 20""")),
    // S15/V6 × S16 — iterator REFINE under BM25: approx stream from the
    // quantile-pruned query, page 2 over-fetched ×2, exact full-query
    // BM25 rescoring, exact-ordered emission
    GraftQuery(
      "sparse_bm25_iter_refine_page2",
      (s, dir) =>
        SparseSearch.annIteratorRefinedPageBM25(queryPostings(s, dir), model(s, dir),
          dropRatio = 0.3, page = 2, pageSize = 10, refineRatio = 2),
      Some(s"""$bm25ScoredCte,
qr AS (
  SELECT qid, term, qtf, abs(CAST(qtf AS DOUBLE)) AS a,
         row_number() OVER (PARTITION BY qid ORDER BY abs(CAST(qtf AS DOUBLE)) ASC, term ASC) AS rn,
         count(*) OVER (PARTITION BY qid) AS nt
  FROM q
),
thr AS (SELECT qid, a AS th FROM qr WHERE rn = floor(CAST(0.3 AS DOUBLE) * CAST(nt AS DOUBLE)) + 1),
qd AS (SELECT qr.qid, qr.term, qr.qtf FROM qr JOIN thr ON qr.qid = thr.qid WHERE qr.a >= thr.th),
ascored AS (
  SELECT qd.qid AS qid, t.doc_id AS nid,
    round(CAST(sum(CAST(round(
      (qd.qtf * ln(((s.n - df.df) + 0.5) / (df.df + 0.5) + 1.0)) *
      ((t.tf * (1.2 + 1.0)) / (t.tf + 1.2 * ((1.0 - 0.75) + (0.75 / s.avgdl) * dl.dl)))
      * 1000000000.0, 0) AS BIGINT)) AS DOUBLE) / 1000000000.0, 4) AS dist
  FROM qd
  JOIN tf t ON qd.term = t.term
  JOIN df ON df.term = t.term
  JOIN dl ON dl.doc_id = t.doc_id
  CROSS JOIN s
  GROUP BY 1, 2
),
win AS (
  SELECT qid, nid FROM (
    SELECT qid, nid, row_number() OVER (PARTITION BY qid ORDER BY dist DESC, nid ASC) AS rn
    FROM ascored
  ) WHERE rn <= 40
),
exact AS (
  SELECT sc.qid, sc.nid, sc.dist FROM scored sc JOIN win ON sc.qid = win.qid AND sc.nid = win.nid
)
SELECT qid, nid, dist, rnk FROM (
  SELECT qid, nid, dist,
         CAST(row_number() OVER (PARTITION BY qid ORDER BY dist DESC, nid ASC) AS INT) AS rnk
  FROM exact
) WHERE rnk > 10 AND rnk <= 20""")),
    // V7 × S9 — sparse GetVectorByIds: reassembled term-sorted sparse rows
    GraftQuery(
      "sparse_get_vector",
      (s, dir) => {
        val ids = Tables.documents(s, dir)
          .filter(col("doc_id") % 97 === 0)
          .select(col("doc_id").as("id"))
        // comma-joined rather than ARRAY: the driver's comparator sorts
        // result columns with pandas, which cannot order list cells
        SparseSearch.getVectorByIds(ids, basePostings(s, dir))
          .select(
            col("id"),
            array_join(col("terms"), ",").as("terms"),
            array_join(transform(col("tfs"), _.cast("string")), ",").as("tfs"))
      },
      Some(s"""WITH $tfCte
SELECT doc_id AS id,
       array_to_string(list(term ORDER BY term), ',') AS terms,
       array_to_string(list(tf ORDER BY term), ',') AS tfs
FROM tf WHERE doc_id % 97 = 0 GROUP BY 1""")),
    // S16 — BM25 top-k: one pass over dl-folded postings, query-term-
    // restricted broadcast stats; scaled-integer exact sums
    GraftQuery(
      "sparse_bm25_knn",
      (s, dir) => {
        val m = model(s, dir)
        SparseSearch.searchBM25(queryPostings(s, dir), m, K)
      },
      Some(bm25Oracle)),
    // V3 × S16 — sparse segment MERGE (compaction): two doc-id-disjoint
    // half-corpus models merged (postings concat, term stats folded
    // algebraically, avgdl re-derived on the union) — BM25 over the
    // merged model answers exactly as the single build, so the same
    // oracle gates the compaction verb
    GraftQuery(
      "sparse_bm25_knn_merged",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val median = docs.selectExpr("percentile(doc_id, 0.5)").head().getDouble(0).toLong
        val m = SparseIndexModel
          .build(docs.filter(col("doc_id") <= median), "doc_id", "text")
          .merge(SparseIndexModel.build(docs.filter(col("doc_id") > median), "doc_id", "text"))
        SparseSearch.searchBM25(queryPostings(s, dir), m, K)
      },
      Some(bm25Oracle)),
    // S16 × S9 — BM25 under MaxScore pruning with max-score-ratio bounds
    // (sparse_inverted_index.h:384-392): identical output to plain BM25
    GraftQuery(
      "sparse_bm25_maxscore_knn",
      (s, dir) => {
        val m = model(s, dir)
        SparseSearch.searchBM25MaxScore(queryPostings(s, dir), m, K, maxScoreRatio = 1.05)
      },
      Some(bm25Oracle)),
    // S16 × S9 — BM25 under the WAND doc-level pivot (SPARSE_WAND with
    // bm25 metric, sparse_inverted_index.h:699-757): same exact output
    GraftQuery(
      "sparse_bm25_wand_knn",
      (s, dir) => {
        val m = model(s, dir)
        SparseSearch.searchBM25MaxScore(queryPostings(s, dir), m, K,
          maxScoreRatio = 1.05, wandPivot = true)
      },
      Some(bm25Oracle)),
    // S9 *_CC — SPARSE_INVERTED_INDEX_CC growing-segment analog
    // (sparse_index_node.cc:431-470): half the corpus is the sealed
    // segment, the other half streams in via Structured Streaming
    // micro-batch append; search over the snapshot (sealed ∪ growing)
    // must hash-match the full-corpus oracle exactly
    GraftQuery(
      "sparse_cc_stream",
      (s, dir) => {
        import graft.streaming.StreamingIndex
        val docs = Tables.documents(s, dir)
        val sealedDf = docs.filter(col("doc_id") % 2 === 0)
        val stage = StreamStage.dir("graft-sparse-cc-src")
        docs.filter(col("doc_id") % 2 === 1)
          .write.mode("overwrite").parquet(stage.toString)
        val grow = StreamStage.dir("graft-sparse-cc-grow")
        val ckpt = StreamStage.dir("graft-sparse-cc-ckpt")
        StreamStage.withStatePartitions(s) {
          StreamingIndex
            .startAppend(s, stage.toString, docs.schema, grow.toString, ckpt.toString)
            .awaitTermination()
        }
        val snap = StreamingIndex.snapshot(s, sealedDf, grow.toString)
        SparseSearch.searchIP(
          queryPostings(s, dir),
          SparseSearch.postings(snap, "doc_id", "text"),
          K)
      },
      Some(ipOracle()))
  )
}
