package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.{BruteForce, Eval, IvfIndex, Metric}
import graft.queries.VectorQueries.{baseVecs, queryVecs, K, QMOD, ROUND, Sql}
import graft.sources.Tables

/** Evaluation + mining queries: recall@k of the IVF arm vs the exact arm
  * (the reference's GetKNNRecall test metric as an engine operator), and
  * label-aware hard-negative mining for contrastive training data.
  */
object EvalQueries {

  def all: Seq[GraftQuery] = Seq(
    // recall@k of the probed IVF arm vs exact brute force — the quality
    // gate the reference computes in tests (utils.h:110-134), as a query.
    // Integer basis points; both arms bounded nq×k so the joins broadcast
    GraftQuery(
      "eval_recall_ivf",
      (s, dir) => {
        val cents = Tables
          .embeddings(s, dir)
          .filter(col("vec_id") % 250 === 0)
          .select(col("vec_id").as("cluster_id"), col("embedding").as("centroid"))
        val base = baseVecs(s, dir).select(col("id"), col("vec"))
        val index = IvfIndex.build(base, cents, ROUND)
        val approx = IvfIndex.search(queryVecs(s, dir), index, cents, K, nprobe = 2, Metric.L2, ROUND)
        val exact = BruteForce.knn(queryVecs(s, dir), baseVecs(s, dir), K, Metric.L2, roundDist = ROUND)
        Eval.recallAtK(approx, exact, K)
      },
      Some(s"""WITH ${Sql.ivfProbeCtes},
ex AS (
  SELECT qid, nid FROM (
    SELECT q.qid AS qid, b.vec_id AS nid,
      CAST(row_number() OVER (PARTITION BY q.qid ORDER BY ${Sql.l2} ASC, b.vec_id ASC) AS INT) AS rnk
    FROM q CROSS JOIN embeddings b
  ) WHERE rnk <= $K
),
h AS (
  SELECT e.qid AS qid, count(*) AS hits
  FROM ex e JOIN ivfk a ON a.qid = e.qid AND a.nid = e.nid
  GROUP BY 1
)
SELECT q0.qid, CAST(coalesce(h.hits, 0) AS INT) AS hits,
  CAST(coalesce(h.hits, 0) * 10000 // $K AS BIGINT) AS recall_bp
FROM (SELECT DISTINCT qid FROM ex) q0 LEFT JOIN h ON h.qid = q0.qid""")),
    // hard-negative mining: top-k nearest with a DIFFERENT label — the
    // pair-level filter the bitset analog cannot push below the join
    GraftQuery(
      "hard_negatives",
      (s, dir) => {
        val q = Tables
          .embeddings(s, dir)
          .filter(col("vec_id") % QMOD === 0)
          .select(
            col("vec_id").as("qid"),
            col("embedding").as("qvec"),
            col("label").as("qlabel"))
        Eval.hardNegatives(q, baseVecs(s, dir), K, Metric.L2, ROUND)
      },
      Some(s"""WITH ql AS (
  SELECT vec_id AS qid, embedding AS qv, label AS qlabel FROM embeddings WHERE vec_id % $QMOD = 0
),
pairs AS (
  SELECT q.qid AS qid, b.vec_id AS nid, ${Sql.l2} AS dist
  FROM ql q JOIN embeddings b ON b.label <> q.qlabel
)
SELECT qid, nid, dist, rnk FROM (
  SELECT qid, nid, dist,
         CAST(row_number() OVER (PARTITION BY qid ORDER BY dist ASC, nid ASC) AS INT) AS rnk
  FROM pairs
) WHERE rnk <= $K""")),
    // SQ8 reconstruction-error dashboard: per-vector L2 + max-element
    // deviation of the quantization round-trip — the pre-commit eval for a
    // quantized storage tier. Model broadcast, errors map-side, no shuffle
    GraftQuery(
      "eval_sq8_error",
      (s, dir) => Eval.sq8ReconError(baseVecs(s, dir).select(col("id"), col("vec")), ROUND),
      Some(s"""WITH ${Sql.sq8ReconCtes}
SELECT vec_id AS id,
  round(sqrt(list_sum(list_transform(range(1, len(embedding)+1), i ->
    (CAST(embedding[i] AS DOUBLE) - rv[i]) * (CAST(embedding[i] AS DOUBLE) - rv[i])))), 4) AS recon_err_l2,
  round(list_max(list_transform(range(1, len(embedding)+1), i ->
    abs(CAST(embedding[i] AS DOUBLE) - rv[i]))), 4) AS recon_err_max
FROM recon""")),
    // embedding outlier screen on peak element magnitude (the
    // rogue-dimension / spiky-activation diagnostic — norms are vacuous on
    // a unit-normalized corpus): per-vector max|x| on the 4dp contract,
    // corpus p1/p99 bounds broadcast back over the scan — the vector-side
    // sibling of events_outliers_mad
    GraftQuery(
      "embed_outliers",
      (s, dir) => {
        val peaks = Tables
          .embeddings(s, dir)
          .select(
            col("vec_id"),
            round(
              aggregate(
                col("embedding"),
                lit(0.0d),
                (m, x) => greatest(m, abs(x.cast("double")))),
              4).as("peak"))
        val bounds = peaks.agg(
          expr("percentile(peak, 0.01)").as("lo"),
          expr("percentile(peak, 0.99)").as("hi"))
        peaks
          .crossJoin(broadcast(bounds))
          .filter(col("peak") < col("lo") || col("peak") > col("hi"))
          .select(col("vec_id"), col("peak"))
      },
      Some("""WITH n AS (
  SELECT vec_id,
    round(list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))), 4) AS peak
  FROM embeddings
),
b AS (SELECT quantile_cont(peak, 0.01) AS lo, quantile_cont(peak, 0.99) AS hi FROM n)
SELECT vec_id, peak FROM n CROSS JOIN b WHERE peak < lo OR peak > hi""")),
    // NDCG@k of the probed IVF arm vs the exact ranking, binary relevance
    // with ppm-scaled log₂ discounts — the discount table is computed once
    // in Scala and embedded as literals in BOTH engines, so libm log
    // differences cannot split them. DCG is an exact integer sum
    GraftQuery(
      "eval_ndcg_ivf",
      (s, dir) => {
        val cents = Tables
          .embeddings(s, dir)
          .filter(col("vec_id") % 250 === 0)
          .select(col("vec_id").as("cluster_id"), col("embedding").as("centroid"))
        val base = baseVecs(s, dir).select(col("id"), col("vec"))
        val index = IvfIndex.build(base, cents, ROUND)
        val approx =
          IvfIndex.search(queryVecs(s, dir), index, cents, K, nprobe = 2, Metric.L2, ROUND)
        val exact = BruteForce.knn(queryVecs(s, dir), baseVecs(s, dir), K, Metric.L2, roundDist = ROUND)
        Eval.ndcgAtK(approx, exact, K)
      },
      Some {
        val disc = Eval.dcgDiscounts(K)
        val idcg = disc.sum
        val caseExpr = disc.zipWithIndex
          .map { case (d, i) => s"WHEN ${i + 1} THEN $d" }
          .mkString("CASE a.rnk ", " ", " END")
        s"""WITH ${Sql.ivfProbeCtes},
ex AS (
  SELECT qid, nid FROM (
    SELECT q.qid AS qid, b.vec_id AS nid,
      CAST(row_number() OVER (PARTITION BY q.qid ORDER BY ${Sql.l2} ASC, b.vec_id ASC) AS INT) AS rnk
    FROM q CROSS JOIN embeddings b
  ) WHERE rnk <= $K
),
d AS (
  SELECT a.qid AS qid, sum($caseExpr) AS dcg
  FROM ivfk a JOIN ex e ON e.qid = a.qid AND e.nid = a.nid
  GROUP BY 1
)
SELECT q0.qid, CAST(coalesce(d.dcg, 0) AS BIGINT) AS dcg_ppm,
  CAST(coalesce(d.dcg, 0) * 10000 // $idcg AS BIGINT) AS ndcg_bp
FROM (SELECT DISTINCT qid FROM ex) q0 LEFT JOIN d ON d.qid = q0.qid"""
      }),
    // per-query reciprocal rank of the first relevant IVF hit (the MRR
    // decomposition): exact rational ppm, 0 when the probe window misses
    // average precision@k (the MAP decomposition) of the probed IVF arm vs
    // the exact arm — position-sensitive where recall@k is set-blind, and
    // denser than MRR's first-hit view. precision@i terms scaled by
    // lcm(1..k) so the whole sum is exact integers
    GraftQuery(
      "eval_ap_ivf",
      (s, dir) => {
        val cents = Tables
          .embeddings(s, dir)
          .filter(col("vec_id") % 250 === 0)
          .select(col("vec_id").as("cluster_id"), col("embedding").as("centroid"))
        val base = baseVecs(s, dir).select(col("id"), col("vec"))
        val index = IvfIndex.build(base, cents, ROUND)
        val approx =
          IvfIndex.search(queryVecs(s, dir), index, cents, K, nprobe = 2, Metric.L2, ROUND)
        val exact = BruteForce.knn(queryVecs(s, dir), baseVecs(s, dir), K, Metric.L2, roundDist = ROUND)
        Eval.apAtK(approx, exact, K)
      },
      Some(s"""WITH ${Sql.ivfProbeCtes},
ex AS (
  SELECT qid, nid FROM (
    SELECT q.qid AS qid, b.vec_id AS nid,
      CAST(row_number() OVER (PARTITION BY q.qid ORDER BY ${Sql.l2} ASC, b.vec_id ASC) AS INT) AS rnk
    FROM q CROSS JOIN embeddings b
  ) WHERE rnk <= $K
),
rel AS (
  SELECT a.qid AS qid, a.rnk,
    row_number() OVER (PARTITION BY a.qid ORDER BY a.rnk ASC) AS h
  FROM ivfk a JOIN ex e ON e.qid = a.qid AND e.nid = a.nid
),
sm AS (SELECT qid, sum(h * (${Eval.lcmTo(K)} // rnk)) AS s FROM rel GROUP BY 1),
rc AS (SELECT qid, count(*) AS r FROM ex GROUP BY 1)
SELECT rc.qid, CAST(coalesce(sm.s, 0) * 10000 // (${Eval.lcmTo(K)} * rc.r) AS BIGINT) AS ap_bp
FROM rc LEFT JOIN sm ON sm.qid = rc.qid""")),
    GraftQuery(
      "eval_mrr_ivf",
      (s, dir) => {
        val cents = Tables
          .embeddings(s, dir)
          .filter(col("vec_id") % 250 === 0)
          .select(col("vec_id").as("cluster_id"), col("embedding").as("centroid"))
        val base = baseVecs(s, dir).select(col("id"), col("vec"))
        val index = IvfIndex.build(base, cents, ROUND)
        val approx =
          IvfIndex.search(queryVecs(s, dir), index, cents, K, nprobe = 2, Metric.L2, ROUND)
        val exact = BruteForce.knn(queryVecs(s, dir), baseVecs(s, dir), K, Metric.L2, roundDist = ROUND)
        Eval.mrrAtK(approx, exact)
      },
      Some(s"""WITH ${Sql.ivfProbeCtes},
ex AS (
  SELECT qid, nid FROM (
    SELECT q.qid AS qid, b.vec_id AS nid,
      CAST(row_number() OVER (PARTITION BY q.qid ORDER BY ${Sql.l2} ASC, b.vec_id ASC) AS INT) AS rnk
    FROM q CROSS JOIN embeddings b
  ) WHERE rnk <= $K
),
m AS (
  SELECT a.qid AS qid, min(a.rnk) AS fr
  FROM ivfk a JOIN ex e ON e.qid = a.qid AND e.nid = a.nid
  GROUP BY 1
)
SELECT q0.qid, CAST(coalesce(m.fr, 0) AS INT) AS first_rel_rank,
  CAST(CASE WHEN m.fr IS NULL THEN 0 ELSE 1000000 // m.fr END AS BIGINT) AS rr_ppm
FROM (SELECT DISTINCT qid FROM ex) q0 LEFT JOIN m ON m.qid = q0.qid""")),
    // matryoshka truncation eval: recall@k of exact search over the FIRST
    // 32 of 64 dims vs the full-dim ground truth — the dimension-budget
    // decision (matryoshka embeddings / cheap prefilter tiers) measured in
    // the engine. Both arms bounded nq×k; the truncation is a map-side
    // slice, so the approx arm scans half the bytes
    GraftQuery(
      "eval_recall_matryoshka",
      (s, dir) => {
        val half = 32
        val qT = queryVecs(s, dir).select(col("qid"), slice(col("qvec"), 1, half).as("qvec"))
        val bT = baseVecs(s, dir).select(col("id"), slice(col("vec"), 1, half).as("vec"))
        val approx = BruteForce.knn(qT, bT, K, Metric.Cosine, roundDist = ROUND)
        val exact =
          BruteForce.knn(queryVecs(s, dir), baseVecs(s, dir), K, Metric.Cosine, roundDist = ROUND)
        Eval.recallAtK(approx, exact, K)
      },
      Some(s"""WITH ${Sql.qView},
ex AS (
  SELECT qid, nid FROM (
    SELECT q.qid AS qid, b.vec_id AS nid,
      CAST(row_number() OVER (PARTITION BY q.qid ORDER BY ${Sql.cosine} DESC, b.vec_id ASC) AS INT) AS rnk
    FROM q CROSS JOIN embeddings b
  ) WHERE rnk <= $K
),
qt AS (SELECT vec_id AS qid, embedding[1:32] AS qv FROM embeddings WHERE vec_id % $QMOD = 0),
bt AS (SELECT vec_id, embedding[1:32] AS bv FROM embeddings),
ax AS (
  SELECT qid, nid FROM (
    SELECT q.qid AS qid, b.vec_id AS nid,
      CAST(row_number() OVER (PARTITION BY q.qid ORDER BY
        round(list_sum(list_transform(range(1, len(q.qv)+1), i ->
          CAST(q.qv[i] AS DOUBLE) * CAST(b.bv[i] AS DOUBLE))) / (
          sqrt(list_sum(list_transform(q.qv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) *
          sqrt(list_sum(list_transform(b.bv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 4)
        DESC, b.vec_id ASC) AS INT) AS rnk
    FROM qt q CROSS JOIN bt b
  ) WHERE rnk <= $K
),
h AS (
  SELECT e.qid AS qid, count(*) AS hits
  FROM ex e JOIN ax a ON a.qid = e.qid AND a.nid = e.nid
  GROUP BY 1
)
SELECT q0.qid, CAST(coalesce(h.hits, 0) AS INT) AS hits,
  CAST(coalesce(h.hits, 0) * 10000 // $K AS BIGINT) AS recall_bp
FROM (SELECT DISTINCT qid FROM ex) q0 LEFT JOIN h ON h.qid = q0.qid""")),
    // contrastive triplet assembly: per anchor, nearest SAME-label vector
    // (positive, self excluded) and nearest DIFFERENT-label vector (hard
    // negative), with the L2 margin between them — the training-pair
    // construction step downstream of hard-negative mining. Both arms are
    // broadcast-query bounded-heap scans; the final join is nq×1 vs nq×1
    GraftQuery(
      "eval_triplets",
      (s, dir) => {
        val q = Tables
          .embeddings(s, dir)
          .filter(col("vec_id") % QMOD === 0)
          .select(
            col("vec_id").as("qid"),
            col("embedding").as("qvec"),
            col("label").as("qlabel"))
        val base = baseVecs(s, dir)
        val d = round(graft.functions.VectorFunctions.l2(col("qvec"), col("vec")), 4)
        val posPairs = broadcast(q)
          .crossJoin(base)
          .filter(col("label") === col("qlabel") && col("id") =!= col("qid"))
          .select(col("qid"), col("id").as("nid"), d.as("dist"))
        val pos = BruteForce
          .topK(posPairs, 1, ascending = true)
          .select(col("qid"), col("nid").as("pos_id"), col("dist").as("pos_dist"))
        val neg = Eval
          .hardNegatives(q, base, 1, Metric.L2, ROUND)
          .select(col("qid"), col("nid").as("neg_id"), col("dist").as("neg_dist"))
        pos
          .join(neg, "qid")
          .select(
            col("qid"),
            col("pos_id"),
            col("pos_dist"),
            col("neg_id"),
            col("neg_dist"),
            round(col("neg_dist") - col("pos_dist"), 4).as("margin"))
      },
      Some(s"""WITH ql AS (
  SELECT vec_id AS qid, embedding AS qv, label AS qlabel FROM embeddings WHERE vec_id % $QMOD = 0
),
pp AS (
  SELECT q.qid AS qid, b.vec_id AS nid, ${Sql.l2} AS dist
  FROM ql q JOIN embeddings b ON b.label = q.qlabel AND b.vec_id <> q.qid
),
pos AS (
  SELECT qid, nid AS pos_id, dist AS pos_dist FROM (
    SELECT qid, nid, dist,
      row_number() OVER (PARTITION BY qid ORDER BY dist ASC, nid ASC) AS rn
    FROM pp
  ) WHERE rn = 1
),
np AS (
  SELECT q.qid AS qid, b.vec_id AS nid, ${Sql.l2} AS dist
  FROM ql q JOIN embeddings b ON b.label <> q.qlabel
),
neg AS (
  SELECT qid, nid AS neg_id, dist AS neg_dist FROM (
    SELECT qid, nid, dist,
      row_number() OVER (PARTITION BY qid ORDER BY dist ASC, nid ASC) AS rn
    FROM np
  ) WHERE rn = 1
)
SELECT pos.qid AS qid, pos_id, pos_dist, neg_id, neg_dist,
  round(neg_dist - pos_dist, 4) AS margin
FROM pos JOIN neg ON neg.qid = pos.qid""")),
    // Spearman rank agreement between the L2 ordering and the cosine
    // re-ordering of the SAME top-K candidate set (metric-sensitivity
    // probe) — exact integer rho surrogate, bounded nq×K arms
    GraftQuery(
      "eval_rank_corr",
      (s, dir) => {
        val ca = BruteForce.knn(queryVecs(s, dir), baseVecs(s, dir), K, Metric.L2,
          roundDist = ROUND)
        val cosRaw = graft.functions.VectorFunctions.cosineSim(col("qvec"), col("vec"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("qid"))
          .orderBy(round(cosRaw, 4).desc, col("nid").asc)
        val cb = ca
          .select(col("qid"), col("nid"))
          .join(baseVecs(s, dir).select(col("id").as("nid"), col("vec")), "nid")
          .join(broadcast(queryVecs(s, dir)), "qid")
          .withColumn("rnk", row_number().over(w))
          .select(col("qid"), col("nid"), col("rnk"))
        Eval.rankCorrelation(ca, cb)
      },
      Some(s"""WITH ${Sql.qView},
pa AS (
  SELECT q.qid AS qid, b.vec_id AS nid, ${Sql.l2} AS dist
  FROM q CROSS JOIN embeddings b
),
ca AS (
  SELECT qid, nid, rnk AS ra FROM (
    SELECT qid, nid,
      CAST(row_number() OVER (PARTITION BY qid ORDER BY dist ASC, nid ASC) AS INT) AS rnk
    FROM pa
  ) WHERE rnk <= $K
),
cb AS (
  SELECT c.qid AS qid, c.nid AS nid,
    row_number() OVER (PARTITION BY c.qid ORDER BY ${Sql.cosine} DESC, c.nid ASC) AS rb
  FROM ca c JOIN q ON q.qid = c.qid JOIN embeddings b ON b.vec_id = c.nid
),
gg AS (
  SELECT ca.qid AS qid, count(*) AS n,
    sum((ca.ra - cb.rb) * (ca.ra - cb.rb)) AS sum_d2
  FROM ca JOIN cb ON cb.qid = ca.qid AND cb.nid = ca.nid
  GROUP BY 1
)
SELECT qid, n, CAST(sum_d2 AS BIGINT) AS sum_d2,
  CAST(CASE WHEN n < 2 THEN 10000
       ELSE 10000 - (60000 * sum_d2) // (n * (n * n - 1)) END AS BIGINT) AS rho_bp
FROM gg""")),
    // kNN majority-vote classification (weak labeling / label propagation):
    // neighbors from the fused bounded-heap scan (self-hits excluded
    // pair-level), votes aggregate nq×k rows, ties break to the smaller
    // label — fully deterministic, whole output hash-gated
    GraftQuery(
      "knn_classify",
      (s, dir) =>
        Eval.knnClassify(
          queryVecs(s, dir),
          baseVecs(s, dir).select(col("id"), col("vec"), col("label")),
          K, Metric.L2, ROUND),
      Some(s"""WITH ${Sql.qView},
nn AS (
  SELECT qid, nid, lab FROM (
    SELECT q.qid AS qid, b.vec_id AS nid, b.label AS lab,
      row_number() OVER (PARTITION BY q.qid ORDER BY ${Sql.l2} ASC, b.vec_id ASC) AS rnk
    FROM q CROSS JOIN embeddings b WHERE b.vec_id <> q.qid
  ) WHERE rnk <= $K
),
v AS (SELECT qid, lab, count(*) AS votes FROM nn GROUP BY 1, 2)
SELECT qid, lab AS pred_label, votes FROM (
  SELECT qid, lab, votes,
    row_number() OVER (PARTITION BY qid ORDER BY votes DESC, lab ASC) AS rn
  FROM v
) WHERE rn = 1""")),
    // per-dimension embedding stats (whitening/normalization diagnostic):
    // 4dp-round → scaled-long sums (order-independent), integer half-up
    // means — the corpus_source_stats determinism contract per axis
    GraftQuery(
      "embed_dim_stats",
      (s, dir) => Eval.dimStats(Tables.embeddings(s, dir)),
      Some("""WITH dims AS (
  SELECT unnest(range(1, len(embedding) + 1)) AS dim
  FROM (SELECT embedding FROM embeddings ORDER BY vec_id LIMIT 1)
),
e AS (
  SELECT d.dim AS dim,
    CAST(CAST(round(CAST(b.embedding[d.dim] AS DOUBLE), 4) AS DECIMAL(18,4)) * 10000 AS BIGINT) AS xs
  FROM embeddings b CROSS JOIN dims d
)
SELECT dim, count(*) AS n,
  CAST((CASE WHEN sum(xs) < 0 THEN -1 WHEN sum(xs) > 0 THEN 1 ELSE 0 END)
    * ((2 * abs(CAST(sum(xs) AS BIGINT)) + count(*)) // (2 * count(*)))
    AS DOUBLE) / 10000.0 AS mean,
  CAST((2 * CAST(sum(xs * xs) AS BIGINT) + count(*) * 10000) // (2 * count(*) * 10000)
    AS DOUBLE) / 10000.0 AS mean_sq,
  CAST(min(xs) AS DOUBLE) / 10000.0 AS mn,
  CAST(max(xs) AS DOUBLE) / 10000.0 AS mx
FROM e GROUP BY dim"""))
  )
}
