package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.SparseSearch
import graft.sources.Tables

/** Sparse vector search over the documents corpus: term-frequency postings
  * as the sparse representation (S3 brute-force sparse, S9 inverted index,
  * S16 BM25). Query rows = every 100th document's tf vector.
  */
object SparseQueries {

  private val QMOD = 100
  private val K = 10

  private def basePostings(s: org.apache.spark.sql.SparkSession, dir: String) =
    SparseSearch.postings(Tables.documents(s, dir), "doc_id", "text")

  private def queryPostings(s: org.apache.spark.sql.SparkSession, dir: String) =
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

  def all: Seq[GraftQuery] = Seq(
    // S3/S9 — exact sparse IP top-k via postings join (integer products ⇒
    // order-independent exact sums)
    GraftQuery(
      "sparse_ip_knn",
      (s, dir) => SparseSearch.searchIP(queryPostings(s, dir), basePostings(s, dir), K),
      Some(s"""WITH $tfCte,
scored AS (
  SELECT q.qid AS qid, t.doc_id AS nid, CAST(sum(q.qtf * t.tf) AS DOUBLE) AS dist
  FROM q JOIN tf t ON q.term = t.term GROUP BY 1, 2
)
SELECT qid, nid, dist, rnk FROM (
  SELECT qid, nid, dist,
         CAST(row_number() OVER (PARTITION BY qid ORDER BY dist DESC, nid ASC) AS INT) AS rnk
  FROM scored
) WHERE rnk <= $K""")),
    // S9 — WAND/MaxScore upper-bound pruning, exact mode: provably
    // identical output to the naive score-all path, so it shares
    // sparse_ip_knn's oracle verbatim — the hash match IS the exactness
    // proof (sparse_inverted_index.h:699-757)
    GraftQuery(
      "sparse_ip_wand_knn",
      (s, dir) => SparseSearch.searchIPWandExact(queryPostings(s, dir), basePostings(s, dir), K),
      Some(s"""WITH $tfCte,
scored AS (
  SELECT q.qid AS qid, t.doc_id AS nid, CAST(sum(q.qtf * t.tf) AS DOUBLE) AS dist
  FROM q JOIN tf t ON q.term = t.term GROUP BY 1, 2
)
SELECT qid, nid, dist, rnk FROM (
  SELECT qid, nid, dist,
         CAST(row_number() OVER (PARTITION BY qid ORDER BY dist DESC, nid ASC) AS INT) AS rnk
  FROM scored
) WHERE rnk <= $K""")),
    // S9 — DAAT_MAXSCORE, exact mode: the essential-list split prunes the
    // postings join itself (index-time max_tf stats → term bounds → only
    // essential lists ∪ candidate docs are scored). Output identical to the
    // naive path ⇒ shares its oracle; the hash match is the exactness proof
    // (sparse_inverted_index.h:759-830)
    GraftQuery(
      "sparse_ip_maxscore_knn",
      (s, dir) => SparseSearch.searchIPMaxScoreExact(queryPostings(s, dir), basePostings(s, dir), K),
      Some(s"""WITH $tfCte,
scored AS (
  SELECT q.qid AS qid, t.doc_id AS nid, CAST(sum(q.qtf * t.tf) AS DOUBLE) AS dist
  FROM q JOIN tf t ON q.term = t.term GROUP BY 1, 2
)
SELECT qid, nid, dist, rnk FROM (
  SELECT qid, nid, dist,
         CAST(row_number() OVER (PARTITION BY qid ORDER BY dist DESC, nid ASC) AS INT) AS rnk
  FROM scored
) WHERE rnk <= $K""")),
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
    // S9 drop_ratio_search analog — query-term pruning before the join
    // (sparse_inverted_index.h:643-663): terms with qtf below the threshold
    // are dropped from the QUERY (not the index); the oracle applies the
    // same deterministic filter, so the pruned semantics are hash-gated
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
    // S16 — BM25 top-k with idf and length normalization; per-term
    // contributions rounded to 9dp and summed as DECIMAL for
    // accumulation-order independence
    GraftQuery(
      "sparse_bm25_knn",
      (s, dir) =>
        SparseSearch.searchBM25(
          queryPostings(s, dir),
          basePostings(s, dir),
          SparseSearch.docLengths(Tables.documents(s, dir), "doc_id", "text"),
          K),
      Some(s"""WITH $tfCte,
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
)
SELECT qid, nid, dist, rnk FROM (
  SELECT qid, nid, dist,
         CAST(row_number() OVER (PARTITION BY qid ORDER BY dist DESC, nid ASC) AS INT) AS rnk
  FROM scored
) WHERE rnk <= $K"""))
  )
}
