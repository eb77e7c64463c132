package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid-search rank fusion — the serving layer the reference's host
  * system runs ABOVE the index verbs: several ranked arms (a dense kNN,
  * a sparse BM25/IP search, …) over the same entity space are merged
  * into one ranked answer per query. The reference itself stops at
  * per-index Search (`include/knowhere/index/index_node.h:133-134`);
  * fusion is how its results are consumed when a collection carries
  * both a dense and a sparse representation, so a complete engine needs
  * it next to the searches themselves.
  *
  * Both rankers keep the repo's determinism contract (ARCHITECTURE.md
  * §3) by staying in INTEGER arithmetic end to end — no float addition
  * whose rounding could differ between engines:
  *
  *  - RRF: the textbook reciprocal-rank fusion `Σ_arms 1/(k0 + rank)`,
  *    held exact as `Σ RrfScale DIV (k0 + rank)` over scaled longs.
  *  - Weighted: per arm and per query, min-max normalize the arm's
  *    scores into [0, 1] (direction-aware, so L2 distances and BM25
  *    similarities fuse coherently), then `Σ weight · norm` — norms in
  *    ppm by integer division, weights integer.
  *
  * Scale shape: every arm is already bounded (nq × k rows by the kNN
  * contract), so fusion is a union + one tiny groupBy — the heavy
  * lifting stays inside the arms, which keep their own 100 TB plans.
  */
object Fusion {

  /** 1e12 — scale for the exact reciprocal-rank contributions. With
    * k0 + rank ≥ 1, each contribution ≤ 1e12 and a fused score over a
    * few arms stays far below Long.MaxValue. */
  val RrfScale: Long = 1000000000000L

  /** 1e6 — ppm scale for min-max-normalized scores in [[weighted]]. */
  val NormScale: Long = 1000000L

  /** Reciprocal-rank fusion. `arms` are ranked results `(qid, nid, rnk)`
    * (rnk 1-based, as every search in this engine emits); the fused
    * score of a candidate is `Σ_arms RrfScale DIV (k0 + rnk)` — a pure
    * function of its per-arm RANKS, so arms with incomparable score
    * scales (an L2 distance, a BM25 score) fuse without normalization.
    * Output: (qid, nid, score, rnk) — top `k` by score desc, nid asc.
    */
  def rrf(arms: Seq[DataFrame], k: Int, k0: Int = 60): DataFrame = {
    require(arms.nonEmpty, "rrf needs at least one arm")
    require(k0 >= 0, s"rrf k0 must be >= 0, got $k0")
    val union = arms
      .map(_.select(col("qid"), col("nid"), col("rnk").cast("long")))
      .reduce(_ unionByName _)
    val scored = union
      .withColumn("_c", expr(s"${RrfScale}L DIV (${k0}L + rnk)"))
      .groupBy(col("qid"), col("nid"))
      .agg(sum(col("_c")).as("score"))
    rankFused(scored, k)
  }

  /** Weighted score fusion. Each arm is `(results, ascending, weight)`:
    * `results` = `(qid, nid, dist)` with dist rounded to 4dp (the
    * engine-wide query convention), `ascending` = the arm's metric
    * direction (true → smaller is better, e.g. L2), `weight` an integer
    * weight. Per arm and per qid the dist is min-max normalized into
    * `[0, NormScale]` ppm — best hit → NormScale regardless of
    * direction; a degenerate arm (all dists equal for a query)
    * normalizes to NormScale for every hit. Candidates missing from an
    * arm contribute 0 for it. Output: (qid, nid, score, rnk).
    */
  def weighted(arms: Seq[(DataFrame, Boolean, Long)], k: Int): DataFrame = {
    require(arms.nonEmpty, "weighted fusion needs at least one arm")
    arms.foreach { case (_, _, w) => require(w >= 0, s"negative weight $w") }
    val parts = arms.map { case (arm, ascending, weight) =>
      // 4dp dists are integral after ×1e4 up to fp ulp — round() pins them
      val d4 = arm.select(
        col("qid"),
        col("nid"),
        round(col("dist") * 10000).cast("long").as("d4"))
      val ext = d4.groupBy(col("qid")).agg(min("d4").as("mn"), max("d4").as("mx"))
      val norm =
        if (ascending) s"(mx - d4) * $NormScale DIV (mx - mn)"
        else s"(d4 - mn) * $NormScale DIV (mx - mn)"
      d4.join(broadcast(ext), "qid")
        .withColumn(
          "_norm",
          when(col("mx") === col("mn"), lit(NormScale)).otherwise(expr(norm)))
        .select(col("qid"), col("nid"), (col("_norm") * weight).as("_c"))
    }
    val scored = parts
      .reduce(_ unionByName _)
      .groupBy(col("qid"), col("nid"))
      .agg(sum(col("_c")).as("score"))
    rankFused(scored, k)
  }

  /** Two-stage retrieve-and-rerank — the RAG retrieval shape: a cheap
    * high-recall arm (BM25, an IVF probe, an LSH bucket …) proposes
    * `candidates` (qid, nid) per query, and the exact dense metric
    * rescores ONLY those. At 100 TB the dense side never scans: the
    * bounded candidate set broadcasts into the base table, so the exact
    * rerank touches nq × R rows instead of nq × nb.
    * Output: (qid, nid, dist, rnk) — exact `metric` over the candidate
    * set, top `k` per query. */
  def retrieveRerank(
      candidates: DataFrame, // (qid, nid), bounded by the recall arm's R
      queries: DataFrame, // (qid, qvec)
      base: DataFrame, // (id, vec, ...)
      k: Int,
      metric: Metric,
      roundDist: Option[Int] = None
  ): DataFrame = {
    val withVec = base
      .select(col("id").as("nid"), col("vec"))
      .join(broadcast(candidates.select(col("qid"), col("nid"))), "nid")
    val scored = withVec.join(broadcast(queries), "qid")
    val raw = metric.dist(col("qvec"), col("vec"))
    val d = roundDist.map(n => round(raw, n)).getOrElse(raw)
    BruteForce.topK(
      scored.select(col("qid"), col("nid"), d.as("dist")),
      k,
      metric.ascending)
  }

  /** Top-k of a fused (qid, nid, score) frame: score desc, nid asc. The
    * frame is bounded (≤ nq · Σ arm-k rows), so a window is fine here —
    * the unbounded side was handled inside the arms. */
  private def rankFused(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("qid")).orderBy(col("score").desc, col("nid").asc)
    scored
      .withColumn("rnk", row_number().over(w).cast("int"))
      .filter(col("rnk") <= k)
      .select(col("qid"), col("nid"), col("score"), col("rnk"))
  }

  /** Maximal-marginal-relevance diversity rerank (Carbonell & Goldstein
    * 1998) — the standard diversification step a RAG/serving stack runs
    * above a retrieval arm: greedily pick `k` of the top-`r` candidates,
    * each step maximizing `λ·relevance − (1−λ)·max-sim-to-selected`.
    *
    * Determinism: relevance and pairwise cosine are rounded (4dp) and
    * scaled to longs; greedy scores are pure integer arithmetic
    * (λ = lambdaNum/lambdaDen as integer weights), ties break on id —
    * the DuckDB oracle unrolls the same `k` steps and matches under the
    * hash gate.
    *
    * Scale shape: the candidate set is bounded (nq×r) BEFORE anything
    * quadratic happens; pairwise sims are nq×r² bounded rows; each of
    * the k unrolled steps windows over ≤ r rows per query. Only the
    * initial kNN arm touches the corpus. */
  def mmr(
      queries: DataFrame, // (qid, qvec)
      base: DataFrame, // (id, vec)
      r: Int,
      k: Int,
      lambdaNum: Long = 7L,
      lambdaDen: Long = 10L,
      roundDist: Option[Int] = Some(4)
  ): DataFrame = {
    require(r >= k && k >= 1, s"need r >= k >= 1, got r=$r k=$k")
    require(
      lambdaDen > 0 && lambdaNum >= 0 && lambdaNum <= lambdaDen,
      s"need 0 <= lambdaNum <= lambdaDen, got $lambdaNum/$lambdaDen")
    import graft.functions.VectorFunctions.cosineSim
    // materialize the two bounded frames ONCE: the corpus-touching kNN arm
    // (nq×r rows) and the pairwise sims (nq×r² rows). Without this the
    // k-step unrolled DAG re-executes the corpus scan and the sim join at
    // every step, and the sel lineage compounds them further.
    val rel = BruteForce
      .knn(queries, base, r, Metric.Cosine, roundDist = roundDist)
      .select(col("qid"), col("nid"), col("dist").as("rel"))
      .localCheckpoint()
    val cands = rel.withColumn("reli", round(col("rel") * 10000, 0).cast("long"))
    val cv = cands
      .select(col("qid"), col("nid"))
      .join(base.select(col("id").as("nid"), col("vec")), "nid")
    val sim4 = roundDist
      .map(n => round(cosineSim(col("va"), col("vb")), n))
      .getOrElse(cosineSim(col("va"), col("vb")))
    val sims = cv
      .select(col("qid"), col("nid").as("na"), col("vec").as("va"))
      .join(cv.select(col("qid"), col("nid").as("nb"), col("vec").as("vb")), Seq("qid"))
      .filter(col("na") =!= col("nb"))
      .select(col("qid"), col("na"), col("nb"),
        round(sim4 * 10000, 0).cast("long").as("simi"))
      .localCheckpoint()
    def pick(scored: DataFrame, rank: Int): DataFrame = {
      val w = Window.partitionBy(col("qid")).orderBy(col("score").desc, col("nid").asc)
      scored
        .withColumn("_rn", row_number().over(w))
        .filter(col("_rn") === 1)
        .select(col("qid"), col("nid"), lit(rank).as("mmr_rank"))
    }
    var sel = pick(cands.withColumn("score", col("reli")), 1)
    for (i <- 2 to k) {
      val rem = cands.join(sel.select(col("qid"), col("nid")), Seq("qid", "nid"), "left_anti")
      val ms = sims
        .join(sel.select(col("qid"), col("nid").as("nb")), Seq("qid", "nb"))
        .groupBy(col("qid"), col("na"))
        .agg(max(col("simi")).as("maxsim"))
        .select(col("qid"), col("na").as("nid"), col("maxsim"))
      val scored = rem
        .join(ms, Seq("qid", "nid"), "left")
        .withColumn(
          "score",
          lit(lambdaNum) * col("reli") -
            lit(lambdaDen - lambdaNum) * coalesce(col("maxsim"), lit(0L)))
      // truncate the per-step lineage (the CC fixpoint pattern): sel is
      // ≤ nq·k rows, so the checkpoint is tiny
      sel = sel.unionByName(pick(scored, i)).localCheckpoint()
    }
    sel
      .join(rel, Seq("qid", "nid"))
      .select(col("qid"), col("nid"), col("rel"), col("mmr_rank").cast("int").as("mmr_rank"))
  }
}

/** Group-by search — top-k GROUPS per query, each group contributing its
  * best `groupSize` hits (the host system's group_by_field/group_size
  * search mode, served from per-query iterators over the reference's
  * AnnIterator verb, `index_node.h:148-153`): groups are ranked by their
  * best hit, hits inside a group by distance.
  *
  * Plan: the (qid, group) top-`groupSize` runs through the bounded-heap
  * aggregate — map-side partial heaps, the shuffle carries ≤ groupSize
  * rows per (query, group, partition), never a full window sort over the
  * candidate set. The group ranking then works on ≤ nq × ngroups rows.
  */
object GroupedSearch {

  /** Exact grouped kNN over a base frame carrying `groupCol`.
    * Output: (qid, `groupCol`, nid, dist, grnk, grp_rnk) where grnk is
    * the hit's rank inside its group and grp_rnk the group's rank for
    * the query (both 1-based); ties by id / group value. */
  def knnGrouped(
      queries: DataFrame,
      base: DataFrame,
      k: Int,
      groupSize: Int,
      metric: Metric,
      groupCol: String = "label",
      baseFilter: Option[Column] = None,
      roundDist: Option[Int] = None
  ): DataFrame = {
    require(k >= 1 && groupSize >= 1, s"need k >= 1, groupSize >= 1; got $k, $groupSize")
    import org.apache.spark.sql.GraftExpr
    val p = BruteForce.pairs(queries, base, metric, baseFilter, roundDist,
      carryCols = Seq(groupCol))
    val heap = GraftExpr.column(
      graft.plans
        .TopKAgg(
          GraftExpr.expression(col("dist")),
          GraftExpr.expression(col("nid").cast("long")),
          groupSize,
          metric.ascending)
        .toAggregateExpression())
    val perGroup = p
      .groupBy(col("qid"), col(groupCol))
      .agg(heap.as("_topk"))
      .select(col("qid"), col(groupCol), posexplode(col("_topk")).as(Seq("_pos", "_e")))
      .select(
        col("qid"),
        col(groupCol),
        col("_e.id").as("nid"),
        col("_e.dist").as("dist"),
        (col("_pos") + 1).cast("int").as("grnk"))
    val bestOrd =
      if (metric.ascending) Seq(col("dist").asc, col(groupCol).asc)
      else Seq(col("dist").desc, col(groupCol).asc)
    val topGroups = perGroup
      .filter(col("grnk") === 1)
      .withColumn(
        "grp_rnk",
        row_number().over(Window.partitionBy(col("qid")).orderBy(bestOrd: _*)).cast("int"))
      .filter(col("grp_rnk") <= k)
      .select(col("qid"), col(groupCol), col("grp_rnk"))
    perGroup
      .join(topGroups, Seq("qid", groupCol))
      .select(col("qid"), col(groupCol), col("nid"), col("dist"), col("grnk"), col("grp_rnk"))
  }
}
