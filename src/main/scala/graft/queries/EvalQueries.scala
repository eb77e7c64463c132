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
SELECT vec_id, peak FROM n CROSS JOIN b WHERE peak < lo OR peak > hi"""))
  )
}
