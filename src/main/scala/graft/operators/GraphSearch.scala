package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Batch graph ANN search — the HNSW/graph-index analog (SURVEY §7.4).
  *
  * The reference's graph search (`src/index/hnsw/faiss_hnsw.cc:63-2941`)
  * walks a small-world graph per query with a beam of `ef` candidates —
  * sequential and data-dependent, anti-Spark. The batch rendering keeps
  * the algorithmic skeleton (entry points → iterative neighbor expansion
  * → bounded beam → final top-k) but advances ALL queries one hop per
  * relational step:
  *
  *   frontier_0 = entry points, exactly scored per query;
  *   hop: candidates = frontier ⋈ graph edges (src→dst), deduped;
  *        scored = candidates ⋈ base vectors, exact distance;
  *        frontier = top-`ef` of frontier ∪ scored per query;
  *   answer = top-k of the final frontier.
  *
  * Determinism: distances round-before-rank, ties by neighbor id, and a
  * fixed iteration count — a fixed unrolling is plain SQL, so the search
  * MECHANICS are oracle-gated; recall quality (governed by ef/iters/graph
  * degree, the reference's `ef`/`efConstruction` analog) is gated by the
  * ANN recall floor in ScalaTest (`tests/ut/test_search.cc:28-30`).
  *
  * Scale shape: the frontier is nq×ef rows per hop; the graph joins on
  * `src` and the base on `id` — partition/bucket both by their join key
  * and hops stay co-located shuffles of frontier-sized frames, never a
  * scan of all pairs. For many iterations persist the frontier per hop
  * (lineage growth); at the 2-3 hops typical of batch refinement the
  * single-DAG form is fine.
  */
object GraphSearch {

  /** Scalable approximate kNN-graph BUILD: each vector searches only its
    * nprobe nearest IVF lists, so candidate generation is a co-located
    * shuffle join on `cluster_id` — never an all-pairs scan, never a
    * broadcast of base-cardinality data. This is the block-join graph
    * construction that survives 100× data (the exact `knnFused` build is
    * quadratic compute); edge quality rides the recall floor, and with
    * deterministic centroids the whole graph is oracle-expressible.
    * nprobe ≥ 2 gives every node edges into its second-nearest list —
    * the cross-cluster links beam search needs. */
  def knnGraphIvf(
      base: DataFrame, // (id, vec)
      centroids: DataFrame, // (cluster_id, centroid)
      degree: Int,
      nprobe: Int = 2,
      metric: Metric = Metric.L2,
      roundDist: Option[Int] = None
  ): DataFrame =
    knnGraphIvfWithDist(base, centroids, degree, nprobe, metric, roundDist)
      .select(col("src"), col("dst"))

  /** [[knnGraphIvf]] keeping the edge distances — consumers that post-
    * process the graph (CAGRA's detour pruning) need the leg lengths
    * without a re-scoring join. */
  def knnGraphIvfWithDist(
      base: DataFrame, // (id, vec)
      centroids: DataFrame, // (cluster_id, centroid)
      degree: Int,
      nprobe: Int = 2,
      metric: Metric = Metric.L2,
      roundDist: Option[Int] = None
  ): DataFrame = {
    // ONE nb×nlist centroid-ranking pass serves both roles: rank 1 is the
    // list assignment (Add), ranks ≤ nprobe are the probes — computing
    // them separately would repeat the dominant distance pass (measured
    // 2× at nb=200k). Same ranking, same tie-breaks ⇒ identical output.
    val cd = {
      val raw = metric.dist(col("vec"), col("centroid"))
      roundDist.map(n => round(raw, n)).getOrElse(raw)
    }
    val ranked = BruteForce.topK(
      base.crossJoin(broadcast(centroids))
        .select(col("id"), col("cluster_id"), cd.as("dist")),
      nprobe, ascending = true, qidCol = "id", idCol = "cluster_id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val index = base.join(
      ranked.filter(col("rnk") === 1).select(col("id"), col("cluster_id")), "id")
    val probes = ranked.select(col("id").as("qid"), col("cluster_id"))
    val q = base.select(col("id").as("qid"), col("vec").as("qvec"))
    val raw = metric.dist(col("qvec"), col("vec"))
    val d = roundDist.map(n => round(raw, n)).getOrElse(raw)
    val pairs = probes
      .join(q, "qid")
      .join(index, "cluster_id")
      .filter(col("qid") =!= col("id"))
      .select(col("qid"), col("id").as("nid"), d.as("dist"))
    val out = BruteForce.topK(pairs, degree, metric.ascending)
      .select(col("qid").as("src"), col("nid").as("dst"), col("dist"))
    out.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    out.count()
    ranked.unpersist()
    out
  }

  /** NN-DESCENT refinement rounds (Dong, Charikar & Li, WWW 2011 — the
    * builder the reference configures for CAGRA's intermediate graph:
    * `gpu_raft_cagra_config.h` `build_algo=NN_DESCENT`, `nn_descent_niter`).
    * The paper's step — "a neighbor of a neighbor is likely a neighbor" —
    * proposes every two-hop pair through the sampled UNDIRECTED
    * neighborhood, scores proposals exactly, and keeps the best `degree`
    * per node. One round typically lifts an approximate kNN graph's edge
    * recall dramatically; the improved edges are what the diversify prune
    * ([[Cagra.optimize]]) and the beam walk then navigate.
    *
    * Relational rendering, scale-first: the sampled neighborhood is a
    * bounded top-`sampleDegree` per node (the paper's ρK sample — ρ·K
    * bounds the join fan-out, here deterministically by rank instead of
    * coin flips so the whole refinement stays oracle-expressible); the
    * proposal set is ONE self-join on the shared midpoint — |V|·s² rows of
    * three longs, no vectors move; scoring joins each endpoint's vector
    * once; the merge is union + the bounded top-k heap. Per round:
    * two shuffles of id-only frames + one vector join — never all pairs.
    * Fixed rounds + round-before-rank ⇒ hash-gateable end to end. */
  def nnDescent(
      edges: DataFrame, // (src, dst, dist) — dist on the rounded grid
      base: DataFrame, // (id, vec)
      degree: Int,
      rounds: Int = 1,
      sampleDegree: Int = 8,
      metric: Metric = Metric.L2,
      roundDist: Option[Int] = None,
      checkpointFinal: Boolean = true
  ): DataFrame = {
    val dedup: Column => Column =
      if (metric.ascending) min(_) else max(_)
    var e = edges.select(col("src"), col("dst"), col("dist"))
    val checkpointed = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    for (r <- 1 to rounds) {
      // sampled undirected neighborhood: out-edges ∪ reverse edges, capped
      // at the sampleDegree nearest per node (metric distances are
      // symmetric, so the reverse edge reuses the stored dist)
      val und = BruteForce.topK(
        e.unionByName(e.select(col("dst").as("src"), col("src").as("dst"), col("dist")))
          .groupBy(col("src"), col("dst"))
          .agg(dedup(col("dist")).as("dist")),
        sampleDegree, metric.ascending, qidCol = "src", idCol = "dst")
        .select(col("src"), col("dst"))
      // two-hop proposals s→m→d through the shared midpoint; proposals
      // that are ALREADY edges carry the identical (metric + rounding)
      // dist in `e`, so the anti-join skips their vector join + score
      // entirely — the union/dedup below would discard the duplicate
      // anyway. On a degree-32 descent most proposals are re-proposals
      // of existing edges, so this halves-or-better the round's vector
      // join (the build's dominant cost) without moving a single row of
      // the result.
      val cands = und.select(col("src"), col("dst").as("mid"))
        .join(und.select(col("src").as("mid"), col("dst")), "mid")
        .filter(col("src") =!= col("dst"))
        .select(col("src"), col("dst"))
        .distinct()
        .join(e.select(col("src"), col("dst")), Seq("src", "dst"), "left_anti")
      val raw = metric.dist(col("_svec"), col("vec"))
      val d = roundDist.map(n => round(raw, n)).getOrElse(raw)
      val scored = cands
        .join(base.select(col("id").as("dst"), col("vec")), "dst")
        .join(base.select(col("id").as("src"), col("vec").as("_svec")), "src")
        .select(col("src"), col("dst"), d.as("dist"))
      val next = BruteForce.topK(
        e.unionByName(scored)
          .groupBy(col("src"), col("dst"))
          .agg(dedup(col("dist")).as("dist")),
        degree, metric.ascending, qidCol = "src", idCol = "dst")
        .select(col("src"), col("dst"), col("dist"))
      // CHECKPOINT per round, not just persist: round r's expression
      // references e four times, so the LOGICAL plan grows ~5× per round
      // even when the data is cached (persist truncates execution, not
      // the analyzed tree) — measured 120 s analyzer/codegen time and
      // ~1 GB driver heap by round 4 on 4,000 edges. localCheckpoint
      // rebases the plan on the materialized blocks (the pointer-doubled
      // CC's pattern, Dedup.scala) and the RETURNED graph is also re-read
      // several times by every consumer (the detour prune alone
      // references it five times).
      if (r == rounds && !checkpointFinal) {
        // caller opted out of the final checkpoint (a one-round build
        // returned straight to a consumer that would otherwise have to
        // release the cached RDD itself): hand back the plain plan — for
        // rounds == 1 it references only `edges`/`base`, nothing cached.
        // Deeper builds keep the per-round checkpoints regardless (the
        // returned plan would reference round r-1's blocks anyway).
        e = next
      } else {
        val next2 = next.localCheckpoint(true)
        checkpointed += next2
        // strip the checkpoint's inherited constraint set: the next round
        // self-unions this frame with its own reversal, and Union's
        // constraint rewrite throws on the origin attributes otherwise
        e = org.apache.spark.sql.GraftExpr.stripCheckpointConstraints(next2)
      }
    }
    // keep the newest checkpoint alive: either it IS the returned frame
    // (checkpointFinal) or the returned plan still reads it (rounds > 1
    // with checkpointFinal=false — only rounds == 1 is fully cache-free)
    checkpointed.dropRight(1).foreach(org.apache.spark.sql.GraftExpr.unpersistCheckpoint)
    e
  }

  /** The NAVIGABLE graph build — IVF-bucketed candidates → NN-descent
    * refinement → diversify prune + reverse-edge merge ([[Cagra.optimize]]
    * with the robust-prune slack α). This is the composition the
    * reference's graph indexes actually ship: hnswlib's heuristic neighbor
    * selection and DiskANN's Vamana RobustPrune (α, `diskann.cc` build
    * config) both exist because a PLAIN kNN graph is a poor navigator —
    * its edges all point into the local clique, the beam cannot cross
    * cluster boundaries, and recall saturates far below 1.0 no matter the
    * ef (measured: 0.651 ceiling at ef=4096, nb=1M — SCALE_RUN round 11).
    * Diversified edges + reverse links restore reachability at the SAME
    * degree budget. Every step is bounded relational algebra; with
    * deterministic centroids the whole build is oracle-expressible. */
  def knnGraphDiversified(
      base: DataFrame, // (id, vec)
      centroids: DataFrame, // (cluster_id, centroid)
      degree: Int,
      intermediateDegree: Int,
      nprobe: Int = 2,
      descentRounds: Int = 1,
      sampleDegree: Int = 8,
      alpha: Double = 1.0,
      metric: Metric = Metric.L2,
      roundDist: Option[Int] = None
  ): DataFrame = {
    val inter = knnGraphIvfWithDist(
      base, centroids, intermediateDegree, nprobe, metric, roundDist)
    val refined =
      if (descentRounds > 0)
        nnDescent(inter, base, intermediateDegree, descentRounds, sampleDegree,
          metric, roundDist)
      else inter
    // refined is materialized (persist/checkpoint upstream) — the count
    // is a cached scan; under the edge limit the detour prune runs as
    // streaming broadcast-hash probes instead of a |E|·degree shuffle
    val out = Cagra.optimize(refined, degree, alpha, metric,
      hintBroadcast = refined.count() <= Cagra.BroadcastEdgeLimit)
      .select(col("src"), col("dst"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    out.count()
    inter.unpersist()
    if (descentRounds > 0)
      org.apache.spark.sql.GraftExpr.unpersistCheckpoint(refined)
    out
  }

  /** Exact distances for candidate (qid, nid) pairs. */
  private def score(
      cands: DataFrame, // (qid, nid)
      queries: DataFrame, // (qid, qvec)
      base: DataFrame, // (id, vec)
      metric: Metric,
      roundDist: Option[Int]
  ): DataFrame = {
    val raw = metric.dist(col("qvec"), col("vec"))
    val d = roundDist.map(n => round(raw, n)).getOrElse(raw)
    cands
      .join(base.select(col("id").as("nid"), col("vec")), "nid")
      .join(broadcast(queries), "qid")
      .select(col("qid"), col("nid"), d.as("dist"))
  }

  private def topEf(scored: DataFrame, ef: Int, metric: Metric): DataFrame =
    BruteForce.topK(scored, ef, metric.ascending)
      .select(col("qid"), col("nid"), col("dist"))

  /** The shared hop loop: beam over `tier` (id, vec) — exact or
    * reconstructed-quantized vectors — returning the final nq×ef frontier
    * plus any hop frames that were persisted (caller unpersists them
    * after materializing its answer). */
  private def beamLoop(
      graph: DataFrame,
      tier: DataFrame, // (id, vec) — the traversal scoring tier
      queries: DataFrame,
      entries: DataFrame,
      ef: Int,
      iters: Int,
      metric: Metric,
      roundDist: Option[Int]
  ): (DataFrame, Seq[DataFrame]) = {
    val persisted = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    // COLLAPSE a heavyweight graph-build subtree (r14): a prune/optimize
    // chain (Cagra detour prune) references its input edge frame on
    // DIFFERENT join keys (src / mid / (mid,dst)), so ReuseExchange can
    // never share them and each hop's plan re-executes the whole build —
    // cagra_knn's explained plan carried 158 Exchange / 124 broadcast
    // nodes and re-ran the fused all-pairs scan per reference
    // (checkpointing the graph: 2.52 → 1.97 s, same-subset A/B). Only
    // large lazy builds are cut: for a plain fused-scan graph both hops
    // join on the SAME key, exchange reuse already shares it, and the
    // A/B showed the checkpoint costs more in extra actions than it
    // saves (knn_graph_search 1.27 → 1.48 s when force-checkpointed —
    // hence the node-count gate, default 20, above knnFused+select and
    // below any prune chain). Same frames, same rounding, same ties —
    // only where the plan is cut changes, so hash-gated results are
    // unchanged.
    val ckptNodes =
      sys.env.getOrElse("GRAFT_BEAM_GRAPH_CKPT_NODES", "20").toInt
    val g =
      if (iters >= 1 && !org.apache.spark.sql.GraftExpr.isMaterialized(graph) &&
        graph.queryExecution.analyzed.collect { case n => n }.size > ckptNodes) {
        val ck = graph.localCheckpoint(true)
        persisted += ck
        ck
      } else graph
    val seed = queries.select(col("qid")).crossJoin(broadcast(entries))
    var frontier = topEf(score(seed, queries, tier, metric, roundDist), ef, metric)
    // materialize the (nq×ef, tiny) frontier per hop for deep walks —
    // hop h otherwise re-executes hops 1..h−1 (quadratic in hop count);
    // at 1-2 hops the extra actions cost more than they save
    val materializeHops = iters >= 3
    for (_ <- 1 to iters) {
      if (materializeHops) {
        frontier.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        frontier.count()
        persisted += frontier
      }
      val cands = frontier
        .join(g.withColumnRenamed("src", "nid"), "nid")
        .select(col("qid"), col("dst").as("nid"))
        .distinct()
      val scored = score(cands, queries, tier, metric, roundDist)
      frontier = topEf(
        frontier.select(col("qid"), col("nid"), col("dist"))
          .union(scored)
          .distinct(),
        ef, metric)
    }
    (frontier, persisted.toSeq)
  }

  /** Release a hop/graph frame pinned by [[beamLoop]] — checkpointed
    * blocks (LogicalRDD) or a cached frame, whichever it is. */
  private[operators] def release(df: DataFrame): Unit = {
    df.unpersist()
    org.apache.spark.sql.GraftExpr.unpersistCheckpoint(df)
  }

  /** Pin the bounded answer, then release the hop frames — callers own
    * only the nq×k result, nothing stays silently cached. */
  private def finish(out: DataFrame, persisted: Seq[DataFrame]): DataFrame = {
    if (persisted.nonEmpty) {
      out.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      out.count()
      persisted.foreach(release)
    }
    out
  }

  /** Beam search over a prebuilt kNN graph. `entries` are the search entry
    * points (the reference's top-layer entry; here an explicit id set —
    * documented deviation, SURVEY §7.4). */
  def beamSearch(
      graph: DataFrame, // (src, dst) directed edges
      base: DataFrame, // (id, vec)
      queries: DataFrame, // (qid, qvec)
      entries: DataFrame, // (nid) entry point ids
      k: Int,
      ef: Int,
      iters: Int,
      metric: Metric = Metric.L2,
      roundDist: Option[Int] = None
  ): DataFrame = {
    require(ef >= k, "beam width ef must be >= k")
    val (frontier, persisted) = beamLoop(graph, base, queries, entries, ef, iters, metric, roundDist)
    finish(BruteForce.topK(frontier, k, metric.ascending), persisted)
  }

  /** Beam-backed RangeSearch — the reference's HNSW range path
    * (`faiss_hnsw.cc:1319-1478`: range results come from the ef-bounded
    * iterator stream, filtered to the radius; a brute-force fallback
    * covers hostile bitsets — that arm is [[graft.HnswIndex]]'s exact
    * `rangeSearch`). Batch analog: the fixed-unroll beam's ef-frontier,
    * two-sided-bounded per [[BruteForce.rangeSearch]]'s per-metric
    * direction. Result quality is ef-bounded exactly like the reference's
    * (a neighbor the beam never admitted cannot be returned), and the
    * composition is fully hash-gateable. */
  def rangeSearch(
      graph: DataFrame, // (src, dst) directed edges
      base: DataFrame, // (id, vec)
      queries: DataFrame, // (qid, qvec)
      entries: DataFrame, // (nid) entry point ids
      ef: Int,
      iters: Int,
      metric: Metric,
      radius: Double,
      rangeFilter: Double,
      roundDist: Option[Int] = None
  ): DataFrame = {
    val (frontier, persisted) = beamLoop(graph, base, queries, entries, ef, iters, metric, roundDist)
    val keep =
      if (metric.ascending) col("dist") >= rangeFilter && col("dist") < radius
      else col("dist") > radius && col("dist") <= rangeFilter
    finish(frontier.filter(keep).select(col("qid"), col("nid"), col("dist")), persisted)
  }

  /** FILTERED beam search — the bitset-filtered graph search that is the
    * reference's hot path under Milvus scalar predicates
    * (`faiss_hnsw.cc:734-779`: the traversal walks filtered nodes as
    * routing waypoints, only unfiltered ids enter the result set;
    * `index_node.h` Search takes a BitsetView on every index). Batch
    * analog: the beam traverses the FULL graph (filtered nodes keep
    * routing, exactly like the reference — dropping them from the walk
    * disconnects the graph at high filter rates), and `allowed` is
    * applied when the final frontier is collected into top-k. Fixed
    * unrolling keeps the whole composition hash-gateable; queries whose
    * ef-frontier holds fewer than k allowed ids return fewer rows (the
    * reference's iterator-fallback threshold `kHnswSearchKnnBFFilterThreshold`
    * flips to brute-force in that regime — [[AdaptiveSearch]] owns that
    * decision here). */
  def beamSearchFiltered(
      graph: DataFrame, // (src, dst) directed edges
      base: DataFrame, // (id, vec)
      queries: DataFrame, // (qid, qvec)
      entries: DataFrame, // (nid) entry point ids
      allowed: DataFrame, // (nid) ids the filter admits
      k: Int,
      ef: Int,
      iters: Int,
      metric: Metric = Metric.L2,
      roundDist: Option[Int] = None
  ): DataFrame = {
    require(ef >= k, "beam width ef must be >= k")
    val (frontier, persisted) = beamLoop(graph, base, queries, entries, ef, iters, metric, roundDist)
    val admitted = frontier.join(
      broadcast(allowed.select(col("nid")).distinct()), Seq("nid"), "left_semi")
    finish(BruteForce.topK(admitted, k, metric.ascending), persisted)
  }

  /** Beam search iterated to a FIXPOINT — the batch analog of the
    * reference's per-query termination (hnswlib stops a query when its
    * candidate queue cannot improve the result set,
    * `src/index/hnsw/hnsw.h` search loop): here hops continue until NO
    * query's ef-frontier improves, bounded by `maxIters`. The per-hop
    * frontier materialization doubles as the fixpoint probe (one tiny
    * count of newly-admitted (qid, nid) pairs — driver-coordinated like
    * the dedup CC loop), so adaptive termination costs no extra action.
    * Walk depth becomes data-dependent, so this variant is recall-gated
    * in ScalaTest rather than hash-gated. */
  def beamSearchConverged(
      graph: DataFrame,
      base: DataFrame,
      queries: DataFrame,
      entries: DataFrame,
      k: Int,
      ef: Int,
      maxIters: Int = 16,
      metric: Metric = Metric.L2,
      roundDist: Option[Int] = None
  ): DataFrame = {
    require(ef >= k, "beam width ef must be >= k")
    val seed = queries.select(col("qid")).crossJoin(broadcast(entries))
    var frontier = topEf(score(seed, queries, base, metric, roundDist), ef, metric)
      .localCheckpoint(true)
    val checkpointed = scala.collection.mutable.ArrayBuffer(frontier)
    var improved = 1L
    var hops = 0
    while (improved > 0 && hops < maxIters) {
      hops += 1
      val cands = frontier
        .join(graph.withColumnRenamed("src", "nid"), "nid")
        .select(col("qid"), col("dst").as("nid"))
        .distinct()
      val scored = score(cands, queries, base, metric, roundDist)
      val next = topEf(frontier.union(scored).distinct(), ef, metric)
        .localCheckpoint(true)
      checkpointed += next
      improved = next.join(frontier, Seq("qid", "nid"), "left_anti").count()
      frontier = next
    }
    lastConvergedHops = hops
    val out = BruteForce.topK(frontier, k, metric.ascending)
    out.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    out.count()
    checkpointed.foreach(org.apache.spark.sql.GraftExpr.unpersistCheckpoint)
    out
  }

  /** Hops the last [[beamSearchConverged]] call took — a test probe. */
  @volatile private[graft] var lastConvergedHops: Int = 0

  /** Feder-style graph introspection (`include/knowhere/feder/`,
    * `src/index/hnsw/hnsw.h:212-257` overview + visit traces,
    * `tests/ut/test_feder.cc`): one (stat, value) frame carrying the
    * graph overview — node/edge/entry counts, out-degree histogram — and
    * the beam's per-hop visit counts (how many distinct (query, node)
    * candidates each relational hop scored — the batch analog of the
    * reference's per-query visit trace). Deterministic given the graph
    * and the usual round/tie-break contract, so the whole frame is
    * oracle-expressible. */
  def federMeta(
      graph: DataFrame, // (src, dst)
      base: DataFrame, // (id, vec)
      queries: DataFrame, // (qid, qvec)
      entries: DataFrame, // (nid)
      ef: Int,
      iters: Int,
      metric: Metric = Metric.L2,
      roundDist: Option[Int] = None
  ): DataFrame = {
    def one(stat: String, df: DataFrame): DataFrame =
      df.agg(count(lit(1)).as("value")).select(lit(stat).as("stat"), col("value"))
    val deg = graph.groupBy(col("src")).agg(count(lit(1)).as("degree"))
    val degHist = deg
      .groupBy(col("degree"))
      .agg(count(lit(1)).as("value"))
      .select(concat(lit("degree_"), col("degree").cast("string")).as("stat"), col("value"))
    val overview = one("graph_nodes", deg)
      .union(one("graph_edges", graph))
      .union(one("entry_points", entries))
      .union(degHist)
    // beam visit trace: re-walk the hops, counting each hop's candidate set
    val seed = queries.select(col("qid")).crossJoin(broadcast(entries))
    var frontier = topEf(score(seed, queries, base, metric, roundDist), ef, metric)
    var out = overview
    for (h <- 1 to iters) {
      val cands = frontier
        .join(graph.withColumnRenamed("src", "nid"), "nid")
        .select(col("qid"), col("dst").as("nid"))
        .distinct()
      out = out.union(one(s"hop${h}_visits", cands))
      val scored = score(cands, queries, base, metric, roundDist)
      frontier = topEf(
        frontier.select(col("qid"), col("nid"), col("dist")).union(scored).distinct(),
        ef, metric)
    }
    out
  }

  /** Feder FULL graph-topology export — the per-node adjacency overview of
    * `include/knowhere/feder/hnsw.h:212-257` (HNSWOverviewData: id_set +
    * per-level json_info), which [[federMeta]]'s scalar stats deliberately
    * summarize: one row per node with its layer, out-degree, and the
    * sorted adjacency rendered as a canonical JSON array string. The
    * reference samples HNSW layers randomly at insert; the deterministic
    * batch restatement is the 4-adic valuation of the node id capped at
    * `maxLevel` — the same geometric 1/4 layer law (hnswlib's default
    * mult ≈ 1/ln(M)), but a pure function of the graph so the whole
    * export is oracle-expressible. Scale: one (src)-keyed aggregate whose
    * payload is the ≤degree neighbor list — never the vectors. */
  def federOverview(graph: DataFrame, maxLevel: Int = 8): DataFrame = {
    val lvl = (1 to maxLevel).foldLeft(lit(0)) { (acc, l) =>
      when(col("nid") % math.pow(4, l).toLong === 0, lit(l)).otherwise(acc)
    }
    graph
      .groupBy(col("src"))
      .agg(sort_array(collect_list(col("dst"))).as("adj"))
      .select(
        col("src").as("nid"),
        size(col("adj")).as("degree"),
        concat(lit("["), concat_ws(",", transform(col("adj"), _.cast("string"))),
          lit("]")).as("adj_json"))
      .select(
        col("nid"),
        lvl.cast("int").as("level"),
        col("degree"),
        col("adj_json"))
  }

  /** Quantized-traversal beam + exact refine — the HNSW_SQ / HNSW_PQ
    * analog (`src/index/hnsw/faiss_hnsw.cc:2928-2939` registers the
    * quantized HNSW variants; the refine loop at `faiss_hnsw.cc:739-860`
    * re-scores the quantized candidate list against raw data).
    *
    * `approx` is the traversal tier: (id, vec) where vec is the
    * RECONSTRUCTED quantized vector (SQ8 midpoint decode, or PQ codeword
    * concatenation — reconstruction-L2 equals ADC for PQ). The beam never
    * touches raw data; `base` raw vectors are read only for the final
    * nq×ef candidate rerank — the same memory-vs-exactness split the
    * quantized HNSW variants exist for. */
  def beamSearchRefined(
      graph: DataFrame, // (src, dst)
      approx: DataFrame, // (id, vec) — quantized/reconstructed tier
      base: DataFrame, // (id, vec) — raw rerank tier
      queries: DataFrame, // (qid, qvec)
      entries: DataFrame, // (nid)
      k: Int,
      ef: Int,
      iters: Int,
      metric: Metric = Metric.L2,
      roundDist: Option[Int] = None
  ): DataFrame = {
    require(ef >= k, "beam width ef must be >= k")
    val (frontier, persisted) = beamLoop(graph, approx, queries, entries, ef, iters, metric, roundDist)
    val rer = score(frontier.select(col("qid"), col("nid")), queries, base, metric, roundDist)
    finish(BruteForce.topK(rer, k, metric.ascending), persisted)
  }

  /** The QUANTIZED beam as a resumable AnnIterator session — the composed
    * iterator workflow of the HNSW_SQ/PQ kinds (`index_node.h:538-567`
    * refine loop over an approx-ordered stream): the ef-bounded frontier,
    * ranked by the quantized tier's scores, is persisted ONCE; `page`
    * consumes approx-ordered batches and `refinedPage` exact-rescores the
    * over-fetched window against the raw tier (iterator_refine_ratio /
    * retain_iterator_order). Stream quality is ef-bounded exactly as the
    * reference's graph iterator is. */
  def beamIterator(
      graph: DataFrame, // (src, dst)
      approx: DataFrame, // (id, vec) — quantized traversal tier
      queries: DataFrame, // (qid, qvec)
      entries: DataFrame, // (nid)
      ef: Int,
      iters: Int,
      metric: Metric = Metric.L2,
      roundDist: Option[Int] = None
  ): AnnIteratorSession = {
    val (frontier, persisted) =
      beamLoop(graph, approx, queries, entries, ef, iters, metric, roundDist)
    val ord =
      if (metric.ascending) Seq(col("dist").asc, col("nid").asc)
      else Seq(col("dist").desc, col("nid").asc)
    val ranked = frontier
      .select(col("qid"), col("nid"), col("dist"))
      .withColumn("rnk",
        org.apache.spark.sql.functions.row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("qid")).orderBy(ord: _*)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    ranked.count()
    persisted.foreach(release)
    new AnnIteratorSession(ranked)
  }
}
