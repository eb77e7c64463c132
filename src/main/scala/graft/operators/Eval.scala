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

  /** Per-vector SQ8 quantization reconstruction error — the evaluation a
    * pipeline runs before committing a corpus to a quantized storage tier:
    * L2 distance and max per-element deviation between each vector and its
    * train→code→reconstruct round-trip ([[Quantization]]). The quantizer
    * model is one broadcast row; errors compute map-side over the scan —
    * no shuffle at any scale. Both outputs round at `roundDist` and are
    * order-independent (a sum of squares per row, a max per row). */
  def sq8ReconError(base: DataFrame, roundDist: Option[Int] = Some(4)): DataFrame = {
    import graft.functions.VectorFunctions
    val stats = Quantization.sq8Train(base)
    val rv = Quantization.sq8Recon(
      Quantization.sq8Code(col("vec"), col("mn"), col("mx")), col("mn"), col("mx"))
    val rawL2 = VectorFunctions.l2(col("vec"), col("_rv"))
    val rawMax = aggregate(
      zip_with(col("vec"), col("_rv"), (a, b) => abs(a.cast("double") - b)),
      lit(0.0d),
      (m, x) => greatest(m, x))
    def r(c: org.apache.spark.sql.Column) = roundDist.map(n => round(c, n)).getOrElse(c)
    base
      .crossJoin(broadcast(stats))
      .select(col("id"), col("vec"), rv.as("_rv"))
      .select(
        col("id"),
        r(rawL2).as("recon_err_l2"),
        r(rawMax).as("recon_err_max"))
  }

  /** Scaled DCG discount table 1e6/log₂(i+1), i = 1..k. Computed ONCE here
    * and embedded as literals in BOTH the Spark plan and the generated
    * oracle SQL — libm log differences can never split the engines. */
  def dcgDiscounts(k: Int): Seq[Long] =
    (1 to k).map(i => math.floor(1e6 / (math.log(i + 1.0) / math.log(2.0))).toLong)

  /** Per-query NDCG@k of `approx` against ground-truth `exact` (both
    * ranked (qid, nid, rnk)), binary relevance: an approx hit at rank i
    * contributes the ppm-scaled discount 1e6/log₂(i+1). DCG stays an
    * exact integer sum; NDCG divides by the constant ideal DCG in basis
    * points. Bounded nq×k inputs — joins broadcast, no corpus scan. */
  def ndcgAtK(approx: DataFrame, exact: DataFrame, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val disc = dcgDiscounts(k)
    val idcg = disc.sum
    val rel = approx
      .select(col("qid"), col("nid"), col("rnk"))
      .join(broadcast(exact.select(col("qid"), col("nid"))), Seq("qid", "nid"), "left_semi")
    val d = rel
      .groupBy(col("qid"))
      .agg(sum(element_at(array(disc.map(lit): _*), col("rnk").cast("int"))).as("dcg"))
    exact
      .select(col("qid"))
      .distinct()
      .join(broadcast(d), Seq("qid"), "left")
      .select(
        col("qid"),
        coalesce(col("dcg"), lit(0L)).as("dcg_ppm"),
        expr(s"CAST(coalesce(dcg, 0) * 10000 DIV $idcg AS BIGINT)").as("ndcg_bp"))
  }

  /** Per-query reciprocal rank of the FIRST relevant approx hit (ppm,
    * `1e6 DIV rank`; 0 when no hit in the window) — the MRR decomposition
    * per query, exact rational arithmetic. */
  def mrrAtK(approx: DataFrame, exact: DataFrame): DataFrame = {
    val rel = approx
      .select(col("qid"), col("nid"), col("rnk"))
      .join(broadcast(exact.select(col("qid"), col("nid"))), Seq("qid", "nid"), "left_semi")
    val m = rel.groupBy(col("qid")).agg(min(col("rnk")).as("fr"))
    exact
      .select(col("qid"))
      .distinct()
      .join(broadcast(m), Seq("qid"), "left")
      .select(
        col("qid"),
        coalesce(col("fr"), lit(0)).cast("int").as("first_rel_rank"),
        expr("CAST(CASE WHEN fr IS NULL THEN 0 ELSE 1000000 DIV fr END AS BIGINT)")
          .as("rr_ppm"))
  }

  /** lcm(1..k) — the precision@i common denominator, embedded as a literal
    * in BOTH engines' arithmetic. */
  def lcmTo(k: Int): Long = (1 to k).foldLeft(1L)((a, i) => a / gcd(a, i) * i)

  /** Per-query average precision@k (the MAP decomposition) of `approx`
    * against ground-truth `exact`, both ranked (qid, nid, rnk): AP =
    * (Σ over relevant approx ranks i of precision@i) / R, R = the query's
    * ground-truth size. Exact integer arithmetic: precision@i = h_i/i is
    * scaled by L = lcm(1..k) so every term is an integer — no float sum
    * can reorder. Bounded nq×k inputs; the per-query window ranks ≤ k
    * rows. */
  def apAtK(approx: DataFrame, exact: DataFrame, k: Int): DataFrame = {
    require(k > 0 && k <= 20, s"k must be in [1, 20] (scaled-sum overflow above), got $k")
    val L = lcmTo(k)
    val rel = approx
      .select(col("qid"), col("nid"), col("rnk"))
      .join(broadcast(exact.select(col("qid"), col("nid"))), Seq("qid", "nid"), "left_semi")
    // hits-so-far at a relevant rank = its position among the query's
    // relevant ranks (row_number over ≤ k rows per query)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("rnk").asc)
    val s = rel
      .withColumn("h", row_number().over(w).cast("long"))
      .groupBy(col("qid"))
      .agg(sum(col("h") * expr(s"$L DIV rnk")).as("s"))
    val r = exact.groupBy(col("qid")).agg(count(lit(1)).as("r"))
    r.join(broadcast(s), Seq("qid"), "left")
      .select(
        col("qid"),
        expr(s"CAST(coalesce(s, 0) * 10000 DIV ($L * r) AS BIGINT)").as("ap_bp"))
  }

  private def gcd(a: Long, b: Long): Long = if (b == 0) a else gcd(b, a % b)

  /** Cohen's kappa agreement between a label column and a prediction
    * column — the chance-corrected classifier-vs-ground-truth view next to
    * the raw agreement rate (`corpus_source_stats.langid_agreement_e4`).
    * Exact integer rational: κ = (p_o − p_e)/(1 − p_e) computed as
    * `(hits·n − Σ_c row_c·col_c) / (n² − Σ_c row_c·col_c)` in basis points
    * — no float division anywhere, so any engine agrees bit-for-bit.
    * Scale shape: the confusion matrix is ≤ |classes|² rows off ONE
    * (label, pred)-keyed aggregate with map-side partials; everything
    * after is arithmetic on that tiny frame. The n² term bounds exactness
    * to n ≤ 3·10⁹ rows per call (64-bit); shard by stratum beyond that
    * and pool the confusion matrices. Output: one row
    * (n, hits, kappa_bp); degenerate p_e = 1 (single shared class)
    * reports 10000 — total agreement with itself. */
  def cohenKappa(pairs: DataFrame, labelCol: String, predCol: String): DataFrame = {
    val conf = pairs
      .groupBy(col(labelCol).as("l"), col(predCol).as("p"))
      .agg(count(lit(1)).as("c"))
    val rowm = conf.groupBy(col("l")).agg(sum(col("c")).as("rc"))
    val colm = conf.groupBy(col("p")).agg(sum(col("c")).as("cc"))
    val pe = rowm
      .join(broadcast(colm), col("l") === col("p"))
      .agg(coalesce(sum(col("rc") * col("cc")), lit(0L)).as("pe_n2"))
    conf
      .agg(
        sum(col("c")).as("n"),
        sum(when(col("l") === col("p"), col("c")).otherwise(0L)).as("hits"))
      .crossJoin(pe)
      .selectExpr(
        "n",
        "hits",
        "CAST(CASE WHEN n * n = pe_n2 THEN 10000 " +
          "ELSE (hits * n - pe_n2) * 10000 DIV (n * n - pe_n2) END AS BIGINT) AS kappa_bp")
  }

  /** Hard-negative mining: per query, the top-k nearest base vectors whose
    * label DIFFERS from the query's own. Same broadcast-queries /
    * map-side-distance / bounded-heap shape as [[BruteForce.knn]] — the
    * label predicate filters pairs before anything is ranked, so only
    * nq×k candidates per partition survive to the reduction. */
  /** Spearman rank agreement between two ranked arms over the SAME
    * per-query item set — the metric-sensitivity probe (does L2 order
    * differ from cosine order? does the quantized arm reorder the exact
    * arm?) next to [[recallAtK]]'s set view. Exact integer surrogate of
    * ρ = 1 − 6Σd²/(n(n²−1)): `rho_bp = 10⁴ − 6·10⁴·Σd² DIV (n(n²−1))`
    * (−10⁴ … 10⁴). Inputs are bounded nq×k frames, so the join and the
    * per-query aggregate broadcast; queries with n < 2 report 10⁴ (a
    * single shared item cannot disagree). */
  def rankCorrelation(
      armA: DataFrame, // (qid, nid, rnk)
      armB: DataFrame // (qid, nid, rnk)
  ): DataFrame = {
    val d = col("ra").cast("long") - col("rb").cast("long")
    armA
      .select(col("qid"), col("nid"), col("rnk").as("ra"))
      .join(armB.select(col("qid"), col("nid"), col("rnk").as("rb")), Seq("qid", "nid"))
      .groupBy(col("qid"))
      .agg(count(lit(1)).as("n"), sum(d * d).as("sum_d2"))
      .select(
        col("qid"),
        col("n"),
        col("sum_d2"),
        when(col("n") < 2, lit(10000L))
          .otherwise(expr("CAST(10000 - (60000 * sum_d2) DIV (n * (n * n - 1)) AS BIGINT)"))
          .as("rho_bp"))
  }

  /** kNN majority-vote classification — the weak-labeling / label-
    * propagation shape a training pipeline runs to label new data from an
    * embedded seed set (the pipeline twin of the reference's search verb:
    * neighbors in, votes out). Self-matches are excluded pair-level
    * (`excludeSelf`, the `BruteForce::Search` self-hit convention when
    * queries are drawn from the base). Vote ties break to the SMALLER
    * label — deterministic, so the whole output hash-gates.
    *
    * Scale shape: the kNN arm is the fused bounded-heap scan (one pass
    * over the base per query chunk); votes aggregate nq×k rows, so
    * everything above the scan broadcasts. */
  def knnClassify(
      queries: DataFrame, // (qid, qvec)
      base: DataFrame, // (id, vec, label)
      k: Int,
      metric: Metric = Metric.L2,
      roundDist: Option[Int] = None
  ): DataFrame = {
    val nn = BruteForce.knnFused(
      queries, base.select(col("id"), col("vec")), k, metric,
      roundDist = roundDist, excludeSelf = true)
    val voted = nn
      .join(broadcast(base.select(col("id").as("nid"), col("label"))), "nid")
      .groupBy(col("qid"), col("label"))
      .agg(count(lit(1)).as("votes"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid"))
      .orderBy(col("votes").desc, col("label").asc)
    voted
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("qid"), col("label").as("pred_label"), col("votes"))
  }

  /** Per-dimension embedding statistics — the whitening / normalization
    * diagnostic (per-dim mean, second moment, min/max) a pipeline computes
    * before standardizing or pruning dimensions (the rogue-dimension
    * screen `embed_outliers` looks at magnitudes; this is the per-axis
    * view). Determinism contract: elements are 4dp-rounded then summed as
    * scaled longs (order-independent), means rendered by the integer
    * half-up division ([[TextAnalysis.halfUpMeanScaled]]) — fp summation
    * order can never flip a reported mean. Scale shape: posexplode fans
    * out nb×dim rows but carries only (dim, scaled-long); the groupBy on
    * `dim` has dim keys — map-side partials collapse everything before
    * one tiny shuffle. */
  def dimStats(
      df: DataFrame, // (…, vecCol ARRAY<FLOAT>)
      vecCol: String = "embedding"
  ): DataFrame = {
    val scaled = (round(col("x").cast("double"), 4).cast("decimal(18,4)") * lit(10000))
      .cast("long")
    df.select(posexplode(col(vecCol)).as(Seq("pos", "x")))
      .select((col("pos") + 1).cast("long").as("dim"), scaled.as("xs"))
      .groupBy(col("dim"))
      .agg(
        count(lit(1)).as("n"),
        TextAnalysis.halfUpMeanScaled(sum(col("xs")), count(lit(1)), 4).as("mean"),
        TextAnalysis
          .halfUpMeanScaled(sum(col("xs") * col("xs")), count(lit(1)) * lit(10000L), 4)
          .as("mean_sq"),
        (min(col("xs")).cast("double") / lit(10000.0d)).as("mn"),
        (max(col("xs")).cast("double") / lit(10000.0d)).as("mx"))
  }

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
