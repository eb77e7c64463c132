package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.{BruteForce, Fusion, GroupedSearch, Metric, SparseSearch}
import graft.queries.VectorQueries.{baseVecs, queryVecs, K, QMOD, ROUND, Sql}

/** Hybrid (multi-arm) search over the documents/embeddings pair — the
  * same entity occupies doc_id in the text corpus and vec_id in the
  * embedding table, so a dense kNN arm and a sparse BM25 arm answer the
  * SAME queries (every QMOD-th entity) and fuse per candidate. Plus the
  * group-by search mode over the dense side.
  *
  * All three fused/grouped scores stay in integer arithmetic (operator
  * Scaladoc), so the DuckDB oracles reproduce them bit-for-bit under the
  * hash gate.
  */
object HybridQueries {

  // dense query view under names that don't collide with the sparse CTEs
  // (bm25ScoredCte owns `q`/`tf`/`dl`/`s`/`df`/`scored`)
  private val qdView =
    s"qd AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id % $QMOD = 0)"

  /** Ranked dense arm CTE body over the shared metric expression. */
  private def denseArm(distExpr: String, desc: Boolean): String = {
    val dir = if (desc) "DESC" else "ASC"
    s"""SELECT qid, nid, dist, rnk FROM (
  SELECT qid, nid, dist,
         CAST(row_number() OVER (PARTITION BY qid ORDER BY dist $dir, nid ASC) AS INT) AS rnk
  FROM (SELECT q.qid AS qid, b.vec_id AS nid, $distExpr AS dist
        FROM qd q CROSS JOIN embeddings b)
) WHERE rnk <= $K"""
  }

  /** Ranked sparse arm from bm25ScoredCte's `scored` (desc scores). */
  private val sparseArm =
    s"""SELECT qid, nid, dist, rnk FROM (
  SELECT qid, nid, dist,
         CAST(row_number() OVER (PARTITION BY qid ORDER BY dist DESC, nid ASC) AS INT) AS rnk
  FROM scored
) WHERE rnk <= $K"""

  private val MmrR = 20
  private val MmrK = 5

  /** DuckDB cosine between two embedding-table aliases (4dp). */
  private def cosBetween(ea: String, eb: String): String =
    s"round(list_sum(list_transform(range(1, len($ea.embedding)+1), i -> " +
      s"CAST($ea.embedding[i] AS DOUBLE) * CAST($eb.embedding[i] AS DOUBLE))) / (" +
      s"sqrt(list_sum(list_transform($ea.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) * " +
      s"sqrt(list_sum(list_transform($eb.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 4)"

  /** The k-step unrolled greedy MMR oracle — mirrors Fusion.mmr's integer
    * arithmetic step for step (sel_i = picks so far; each step scores the
    * remaining candidates 7·reli − 3·max-sim-to-selected and takes the
    * window top, ties on nid). */
  private def mmrOracle: String = {
    val steps = (2 to MmrK)
      .map { i =>
        val selUnion = (1 until i).map(j => s"SELECT qid, nid FROM s$j").mkString(" UNION ALL ")
        s"""sel${i - 1} AS ($selUnion),
s$i AS (
  SELECT qid, nid, $i AS mmr_rank FROM (
    SELECT c.qid AS qid, c.nid AS nid,
      row_number() OVER (PARTITION BY c.qid
        ORDER BY (7 * c.reli - 3 * coalesce(m.maxsim, 0)) DESC, c.nid ASC) AS rn
    FROM candi c
    LEFT JOIN (
      SELECT s.qid AS qid, p.na AS nid, max(p.simi) AS maxsim
      FROM sel${i - 1} s JOIN sims p ON p.qid = s.qid AND p.nb = s.nid
      GROUP BY 1, 2
    ) m ON m.qid = c.qid AND m.nid = c.nid
    WHERE NOT EXISTS (SELECT 1 FROM sel${i - 1} x WHERE x.qid = c.qid AND x.nid = c.nid)
  ) WHERE rn = 1
)"""
      }
      .mkString(",\n")
    val allSteps = (1 to MmrK).map(i => s"SELECT * FROM s$i").mkString(" UNION ALL ")
    s"""WITH $qdView,
cand AS (
  SELECT qid, nid, dist AS rel FROM (
    SELECT qid, nid, dist,
      row_number() OVER (PARTITION BY qid ORDER BY dist DESC, nid ASC) AS rnk
    FROM (SELECT q.qid AS qid, b.vec_id AS nid, ${Sql.cosine} AS dist
          FROM qd q CROSS JOIN embeddings b)
  ) WHERE rnk <= $MmrR
),
candi AS (SELECT qid, nid, rel, CAST(round(rel * 10000, 0) AS BIGINT) AS reli FROM cand),
sims AS (
  SELECT a.qid AS qid, a.nid AS na, c.nid AS nb,
    CAST(round(${cosBetween("ea", "ec")} * 10000, 0) AS BIGINT) AS simi
  FROM cand a
  JOIN embeddings ea ON ea.vec_id = a.nid
  JOIN cand c ON c.qid = a.qid AND c.nid <> a.nid
  JOIN embeddings ec ON ec.vec_id = c.nid
),
s1 AS (
  SELECT qid, nid, 1 AS mmr_rank FROM (
    SELECT qid, nid,
      row_number() OVER (PARTITION BY qid ORDER BY reli DESC, nid ASC) AS rn
    FROM candi
  ) WHERE rn = 1
),
$steps
SELECT u.qid, u.nid, c.rel, CAST(u.mmr_rank AS INT) AS mmr_rank
FROM ($allSteps) u
JOIN cand c ON c.qid = u.qid AND c.nid = u.nid"""
  }

  def all: Seq[GraftQuery] = Seq(
    // MMR diversity rerank: top-20 cosine candidates per query, greedy
    // 5-pick maximizing 0.7·rel − 0.3·max-sim-to-selected — all integer
    // arithmetic after the 4dp rounds, so the unrolled oracle hash-matches
    GraftQuery(
      "mmr_rerank_knn",
      (s, dir) =>
        Fusion.mmr(queryVecs(s, dir), baseVecs(s, dir), r = MmrR, k = MmrK,
          roundDist = ROUND),
      Some(mmrOracle)),
    // RRF hybrid: dense L2 kNN + sparse BM25 top-k over the same qid set,
    // fused by exact reciprocal-rank score Σ 1e12 DIV (60 + rnk) — rank-only,
    // so the L2/BM25 score-scale mismatch never matters
    GraftQuery(
      "hybrid_rrf_knn",
      (s, dir) => {
        val dense = BruteForce.knn(queryVecs(s, dir), baseVecs(s, dir), K,
          Metric.L2, roundDist = ROUND)
        val sparse = SparseSearch.searchBM25(
          SparseQueries.queryPostings(s, dir), SparseQueries.model(s, dir), K)
        Fusion.rrf(Seq(dense, sparse), K)
      },
      Some(s"""${SparseQueries.bm25ScoredCte},
$qdView,
dense AS (${denseArm(Sql.l2, desc = false)}),
sparse AS ($sparseArm),
u AS (SELECT qid, nid, rnk FROM dense UNION ALL SELECT qid, nid, rnk FROM sparse),
fs AS (SELECT qid, nid, CAST(sum(${Fusion.RrfScale} // (60 + rnk)) AS BIGINT) AS score
       FROM u GROUP BY 1, 2)
SELECT qid, nid, score, rnk FROM (
  SELECT qid, nid, score,
         CAST(row_number() OVER (PARTITION BY qid ORDER BY score DESC, nid ASC) AS INT) AS rnk
  FROM fs
) WHERE rnk <= $K""")),
    // weighted hybrid: per-arm per-query min-max normalization to ppm
    // (direction-aware; degenerate arm → NormScale), integer weights
    // 700/300, missing-arm candidates contribute 0 — all integer-exact
    GraftQuery(
      "hybrid_weighted_knn",
      (s, dir) => {
        val dense = BruteForce.knn(queryVecs(s, dir), baseVecs(s, dir), K,
          Metric.Cosine, roundDist = ROUND)
        val sparse = SparseSearch.searchBM25(
          SparseQueries.queryPostings(s, dir), SparseQueries.model(s, dir), K)
        Fusion.weighted(Seq((dense, false, 700L), (sparse, false, 300L)), K)
      },
      Some(s"""${SparseQueries.bm25ScoredCte},
$qdView,
dense AS (${denseArm(Sql.cosine, desc = true)}),
sparse AS ($sparseArm),
dn AS (SELECT qid, nid, CAST(round(dist * 10000, 0) AS BIGINT) AS d4 FROM dense),
dne AS (SELECT qid, nid, d4,
               min(d4) OVER (PARTITION BY qid) AS mn,
               max(d4) OVER (PARTITION BY qid) AS mx FROM dn),
dc AS (SELECT qid, nid,
              (CASE WHEN mx = mn THEN ${Fusion.NormScale}
                    ELSE (d4 - mn) * ${Fusion.NormScale} // (mx - mn) END) * 700 AS c
       FROM dne),
sn AS (SELECT qid, nid, CAST(round(dist * 10000, 0) AS BIGINT) AS d4 FROM sparse),
sne AS (SELECT qid, nid, d4,
               min(d4) OVER (PARTITION BY qid) AS mn,
               max(d4) OVER (PARTITION BY qid) AS mx FROM sn),
sc AS (SELECT qid, nid,
              (CASE WHEN mx = mn THEN ${Fusion.NormScale}
                    ELSE (d4 - mn) * ${Fusion.NormScale} // (mx - mn) END) * 300 AS c
       FROM sne),
u AS (SELECT qid, nid, c FROM dc UNION ALL SELECT qid, nid, c FROM sc),
fs AS (SELECT qid, nid, CAST(sum(c) AS BIGINT) AS score FROM u GROUP BY 1, 2)
SELECT qid, nid, score, rnk FROM (
  SELECT qid, nid, score,
         CAST(row_number() OVER (PARTITION BY qid ORDER BY score DESC, nid ASC) AS INT) AS rnk
  FROM fs
) WHERE rnk <= $K""")),
    // two-stage retrieve-and-rerank (the RAG retrieval shape): BM25
    // proposes 50 candidates per query, the exact dense cosine rescores
    // ONLY those — the bounded candidate set broadcasts into the base
    // table, so the dense side reads nq × 50 vectors, never the corpus
    GraftQuery(
      "hybrid_rerank_knn",
      (s, dir) => {
        val cands = SparseSearch.searchBM25(
          SparseQueries.queryPostings(s, dir), SparseQueries.model(s, dir), 50)
        Fusion.retrieveRerank(cands, queryVecs(s, dir), baseVecs(s, dir), K,
          Metric.Cosine, roundDist = ROUND)
      },
      Some(s"""${SparseQueries.bm25ScoredCte},
$qdView,
cands AS (
  SELECT qid, nid FROM (
    SELECT qid, nid,
           row_number() OVER (PARTITION BY qid ORDER BY dist DESC, nid ASC) AS rnk
    FROM scored
  ) WHERE rnk <= 50
),
rr AS (
  SELECT q.qid AS qid, b.vec_id AS nid, ${Sql.cosine} AS dist
  FROM cands c
  JOIN qd q ON q.qid = c.qid
  JOIN embeddings b ON b.vec_id = c.nid
)
SELECT qid, nid, dist, rnk FROM (
  SELECT qid, nid, dist,
         CAST(row_number() OVER (PARTITION BY qid ORDER BY dist DESC, nid ASC) AS INT) AS rnk
  FROM rr
) WHERE rnk <= $K""")),
    // group-by search: top-4 label groups per query, best 3 hits each —
    // groups ranked by their best hit; per-(qid,label) top via the bounded
    // heap, the window only ever sees nq × ngroups rows
    GraftQuery(
      "knn_grouped",
      (s, dir) =>
        GroupedSearch.knnGrouped(queryVecs(s, dir), baseVecs(s, dir),
          k = 4, groupSize = 3, Metric.L2, roundDist = ROUND),
      Some(s"""WITH $qdView,
pairs AS (SELECT q.qid AS qid, b.label AS label, b.vec_id AS nid, ${Sql.l2} AS dist
          FROM qd q CROSS JOIN embeddings b),
pg AS (SELECT qid, label, nid, dist,
              CAST(row_number() OVER (PARTITION BY qid, label ORDER BY dist ASC, nid ASC) AS INT) AS grnk
       FROM pairs),
pg2 AS (SELECT * FROM pg WHERE grnk <= 3),
tg AS (SELECT qid, label,
              CAST(row_number() OVER (PARTITION BY qid ORDER BY dist ASC, label ASC) AS INT) AS grp_rnk
       FROM pg2 WHERE grnk = 1)
SELECT pg2.qid, pg2.label, pg2.nid, pg2.dist, pg2.grnk, tg.grp_rnk
FROM pg2 JOIN tg ON tg.qid = pg2.qid AND tg.label = pg2.label
WHERE tg.grp_rnk <= 4""")),
    // LATE-INTERACTION multi-vector search (ColBERT MaxSim): documents and
    // queries are BAGS of vectors (every 4 consecutive embeddings = one
    // doc; every 50th embedding, two per query) and score = Σ over query
    // vectors of the MAX rounded dot any doc vector reaches — the
    // token-level retrieval shape single-vector engines cannot express.
    // Per-pair round → exact max → DECIMAL sum keeps every engine
    // bit-identical; query bag broadcasts, both aggregates are map-side
    // partial, top-k rides the bounded heap
    GraftQuery(
      "multivec_maxsim_knn",
      (s, dir) => {
        val emb = graft.sources.Tables.embeddings(s, dir)
        val qv = emb
          .filter(col("vec_id") % 50 === 0)
          .select(
            (col("vec_id") / 100).cast("long").as("qid"),
            col("vec_id").as("qvec_id"),
            col("embedding").as("qvec"))
        val bv = emb.select(
          (col("vec_id") / 4).cast("long").as("did"),
          col("vec_id").as("bvec_id"),
          col("embedding").as("vec"))
        graft.operators.MultiVector.maxSimKnn(qv, bv, k = K, roundDist = ROUND)
      },
      Some(s"""WITH qv AS (
  SELECT CAST(vec_id // 100 AS BIGINT) AS qid, vec_id AS qvec_id, embedding AS qvec
  FROM embeddings WHERE vec_id % 50 = 0
),
bv AS (SELECT CAST(vec_id // 4 AS BIGINT) AS did, embedding FROM embeddings),
mp AS (
  SELECT q.qid AS qid, q.qvec_id AS qvec_id, b.did AS did,
    max(round(list_sum(list_transform(range(1, len(q.qvec)+1), i ->
      CAST(q.qvec[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))), 4)) AS m
  FROM qv q CROSS JOIN bv b
  GROUP BY 1, 2, 3
),
sc AS (
  SELECT qid, did AS nid,
    round(CAST(sum(CAST(m AS DECIMAL(28,4))) AS DOUBLE), 4) AS dist
  FROM mp GROUP BY 1, 2
)
SELECT qid, nid, dist, rnk FROM (
  SELECT qid, nid, dist,
         CAST(row_number() OVER (PARTITION BY qid ORDER BY dist DESC, nid ASC) AS INT) AS rnk
  FROM sc
) WHERE rnk <= $K"""))
  )
}
