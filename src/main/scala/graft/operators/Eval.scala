package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Evaluation and mining utilities around the search operators.
  *
  * `recallAtK` is the reference's own ANN quality gate — `GetKNNRecall`
  * (`tests/ut/utils.h:110-134`) compares an approximate result's id set
  * against the exact top-k per query — promoted here to a first-class
  * operator so recall can be measured IN the engine, over any two ranked
  * results, instead of only inside unit tests.
  *
  * `hardNegatives` is the contrastive-training mining shape: nearest
  * neighbors under a pair-level label constraint. The reference's bitset
  * filter (`bitsetview.h:21-147`) can only see base rows; mining needs the
  * (query, base) pair — the one place the filter genuinely cannot be
  * pushed below the join.
  */
object Eval {

  /** Per-query recall@k of `approx` against the ground-truth `exact`
    * ranked result, in exact integer basis points (`hits·10000 DIV k`).
    * Set-intersection semantics (like the reference metric) make the value
    * insensitive to equal-distance tie order on either side. Both inputs
    * are bounded (nq×k rows), so the semi-join and the count broadcast —
    * no corpus scan, no wide shuffle. */
  def recallAtK(approx: DataFrame, exact: DataFrame, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val hits = exact
      .select(col("qid"), col("nid"))
      .join(broadcast(approx.select(col("qid"), col("nid"))), Seq("qid", "nid"), "left_semi")
      .groupBy(col("qid"))
      .agg(count(lit(1)).cast("int").as("hits"))
    exact
      .select(col("qid"))
      .distinct()
      .join(broadcast(hits), Seq("qid"), "left")
      .select(
        col("qid"),
        coalesce(col("hits"), lit(0)).as("hits"),
        expr(s"CAST(coalesce(hits, 0) * 10000 DIV $k AS BIGINT)").as("recall_bp"))
  }

  /** Hard-negative mining: per query, the top-k nearest base vectors whose
    * label DIFFERS from the query's own. Same broadcast-queries /
    * map-side-distance / bounded-heap shape as [[BruteForce.knn]] — the
    * label predicate filters pairs before anything is ranked, so only
    * nq×k candidates per partition survive to the reduction. */
  def hardNegatives(
      queries: DataFrame, // (qid, qvec, qlabel)
      base: DataFrame, // (id, vec, label)
      k: Int,
      metric: Metric,
      roundDist: Option[Int] = None
  ): DataFrame = {
    val raw = metric.dist(col("qvec"), col("vec"))
    val d = roundDist.map(n => round(raw, n)).getOrElse(raw)
    val prs = broadcast(queries)
      .crossJoin(base)
      .filter(col("label") =!= col("qlabel"))
      .select(col("qid"), col("id").as("nid"), d.as("dist"))
    BruteForce.topK(prs, k, metric.ascending)
  }
}
