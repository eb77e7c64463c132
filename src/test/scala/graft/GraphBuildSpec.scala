package graft

import org.apache.spark.sql.functions._

import graft.operators._
import graft.sources.Tables

/** Graph BUILD quality gates — the navigability toolchain the reference's
  * graph indexes ship (NN_DESCENT for CAGRA's intermediate graph,
  * `gpu_raft_cagra_config.h`; Vamana RobustPrune's α slack,
  * `src/index/diskann/diskann.cc` build config; hnswlib's heuristic
  * neighbor selection). A plain kNN graph is a poor navigator — these
  * gates pin that the refinement/pruning steps actually earn their cost.
  */
class GraphBuildSpec extends SparkSpec {

  private lazy val base = Tables
    .embeddings(spark, sf0001)
    .select(col("vec_id").as("id"), col("embedding").as("vec"))
    .cache()

  /** Exact kNN edge set at `degree` — the target NN-descent converges to. */
  private def exactEdges(degree: Int) = BruteForce
    .knnFused(
      base.select(col("id").as("qid"), col("vec").as("qvec")),
      base, degree, Metric.L2, roundDist = Some(4), excludeSelf = true)
    .select(col("qid").as("src"), col("nid").as("dst"), col("dist"))

  /** Fraction of the exact kNN edges present in `got`. */
  private def edgeRecall(got: org.apache.spark.sql.DataFrame, degree: Int): Double = {
    val exact = exactEdges(degree).select("src", "dst")
    val hit = got.select("src", "dst").join(exact, Seq("src", "dst"), "left_semi").count()
    hit.toDouble / exact.count()
  }

  test("NN-descent lifts a random-seeded graph toward the exact kNN edges") {
    val degree = 8
    // the paper's initialization: a RANDOM graph (Dong et al. 2011 §2 —
    // random long-range edges are what make convergence O(log n); a ring
    // seed, by contrast, only doubles its id-window per round and cannot
    // cover the corpus in a fixed round budget). Ids carry no embedding
    // locality, so the seed's edge recall is near zero and every bit of
    // the final recall is earned by the two-hop proposal rounds.
    val ring = base
      .select(col("id"), explode(sequence(lit(1), lit(degree))).as("off"))
      .select(col("id").as("src"),
        pmod(xxhash64(col("id") * 131 + col("off")), lit(500L)).as("dst"))
      .filter(col("src") =!= col("dst"))
    val seed = ring
      .join(base.select(col("id").as("dst"), col("vec")), "dst")
      .join(base.select(col("id").as("src"), col("vec").as("_sv")), "src")
      .select(col("src"), col("dst"),
        round(Metric.L2.dist(col("_sv"), col("vec")), 4).as("dist"))
    val before = edgeRecall(seed, degree)
    val refined = GraphSearch.nnDescent(seed, base, degree,
      rounds = 6, sampleDegree = degree, metric = Metric.L2, roundDist = Some(4))
    val after = edgeRecall(refined, degree)
    assert(before < 0.2, s"ring seed unexpectedly good ($before) — test is vacuous")
    assert(after >= 0.6, s"NN-descent edge recall $after below the ANN floor")
    assert(after > before + 0.3, s"NN-descent barely improved: $before -> $after")
    // degree contract: no node exceeds the cap
    val maxDeg = refined.groupBy("src").count().agg(max("count")).head().getLong(0)
    assert(maxDeg <= degree)
  }

  test("robust-prune alpha: edge counts order a<1 <= 1.0 <= a>1; alpha=1 is bit-identical") {
    val inter = exactEdges(8)
    val tight = Cagra.optimize(inter, graphDegree = 4, alpha = 0.8)
    val plain = Cagra.optimize(inter, graphDegree = 4)
    val loose = Cagra.optimize(inter, graphDegree = 4, alpha = 1.2)
    // alpha scales the detour's second leg: smaller alpha marks MORE edges
    // detourable, so fewer survive into the re-cap
    val (nT, nP, nL) = (tight.count(), plain.count(), loose.count())
    assert(nT <= nP && nP <= nL, s"alpha ordering violated: $nT, $nP, $nL")
    // the default path must stay bit-identical to the 2-arg form — the
    // hash-gated cagra_build queries depend on it
    val explicit1 = Cagra.optimize(inter, graphDegree = 4, alpha = 1.0)
    assert(explicit1.exceptAll(plain).isEmpty && plain.exceptAll(explicit1).isEmpty)
  }

  test("diversified build navigates at least as well as the plain kNN graph") {
    val queries = Tables
      .embeddings(spark, sf0001)
      .filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val truth = BruteForce.knn(queries, base, 10, Metric.L2)
    val cents = base.filter(col("id") % 100 === 0)
      .select((col("id") / 100).cast("long").as("cluster_id"), col("vec").as("centroid"))
    val entries = base.filter(col("id") % 50 === 0).select(col("id").as("nid"))
    def beamRecall(graph: org.apache.spark.sql.DataFrame): Double = recall(
      GraphSearch.beamSearch(graph, base, queries, entries, k = 10, ef = 16,
        iters = 3, Metric.L2, roundDist = Some(4)),
      truth)
    val plainR = beamRecall(
      GraphSearch.knnGraphIvf(base, cents, degree = 4, nprobe = 2, Metric.L2, Some(4)))
    val divR = beamRecall(
      GraphSearch.knnGraphDiversified(base, cents, degree = 4, intermediateDegree = 8,
        nprobe = 2, descentRounds = 1, sampleDegree = 8, alpha = 1.0,
        metric = Metric.L2, roundDist = Some(4)))
    assert(divR >= 0.6, s"diversified beam recall $divR below the ANN floor")
    assert(divR >= plainR, s"diversify+reverse lost recall: plain $plainR vs div $divR")
  }

  test("factory graphBuild knobs route HNSW through the diversified composition") {
    val gb = Params.GraphBuildParams(descentRounds = 1, sampleDegree = 6, alpha = 0.9)
    val idx = graft.IndexFactory
      .build(spark, "HNSW", base, Metric.L2, roundDist = Some(4), graphBuild = gb)
      .asInstanceOf[HnswIndex]
    // the factory's own kmeans (nlist=16, seed=42 defaults) — rebuilt here
    // so the direct composition sees identical centroids
    val cents = IvfIndex.trainKMeans(spark, base, 16, 42L)
    val direct = GraphSearch.knnGraphDiversified(base, cents, degree = 8,
      intermediateDegree = gb.interOr(8), nprobe = 2, descentRounds = 1,
      sampleDegree = 6, alpha = 0.9, metric = Metric.L2, roundDist = Some(4))
    assert(idx.graph.exceptAll(direct).isEmpty && direct.exceptAll(idx.graph).isEmpty,
      "factory-built diversified graph differs from the direct composition")
    // defaults stay plain: bit-identical to the old factory output
    val plainIdx = graft.IndexFactory
      .build(spark, "HNSW", base, Metric.L2, roundDist = Some(4))
      .asInstanceOf[HnswIndex]
    val plainGraph = GraphSearch.knnGraphIvf(base, cents, degree = 8, nprobe = 2,
      Metric.L2, Some(4))
    assert(plainIdx.graph.exceptAll(plainGraph).isEmpty &&
      plainGraph.exceptAll(plainIdx.graph).isEmpty)
  }
}
