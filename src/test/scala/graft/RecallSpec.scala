package graft

import org.apache.spark.sql.functions._

import graft.operators._
import graft.sources.Tables

/** Reference-style quality gates (`tests/ut/test_search.cc:28-30`):
  * recall ≥ 0.6 for ANN paths, ≥ 0.95 for brute-force-class paths, vs the
  * exact search as ground truth — computed as sorted-id set intersection.
  */
class RecallSpec extends SparkSpec {

  private val K = 10

  private lazy val queries = Tables
    .embeddings(spark, sf0001)
    .filter(col("vec_id") % 50 === 0)
    .select(col("vec_id").as("qid"), col("embedding").as("qvec"))

  private lazy val base = Tables
    .embeddings(spark, sf0001)
    .select(col("vec_id").as("id"), col("embedding").as("vec"))

  private lazy val truth = BruteForce.knn(queries, base, K, Metric.L2).cache()

  test("IVF with KMeans centroids, nprobe=2 of 8: recall >= 0.6 (ANN floor)") {
    val cents = IvfIndex.trainKMeans(spark, base, nlist = 8)
    val index = IvfIndex.build(base, cents)
    val got = IvfIndex.search(queries, index, cents, K, nprobe = 2)
    assert(recall(got, truth) >= 0.6)
  }

  test("IVF nprobe=nlist is exact (recall 1.0)") {
    val cents = IvfIndex.trainKMeans(spark, base, nlist = 8)
    val index = IvfIndex.build(base, cents)
    val got = IvfIndex.search(queries, index, cents, K, nprobe = 8)
    assert(recall(got, truth) == 1.0)
  }

  test("SQ8 + rerank: recall >= 0.95 (brute-force-class floor)") {
    val got = Quantization.sq8Knn(queries, base, K, reorderK = 50)
    assert(recall(got, truth) >= 0.95)
  }

  test("PQ (m=8, ksub=16) ADC + rerank: recall >= 0.6 (ANN floor)") {
    val model = ProductQuant.train(spark, base, m = 8, ksub = 16)
    val got = ProductQuant.pqKnn(queries, base, model, K, reorderK = 50)
    assert(recall(got, truth) >= 0.6)
  }

  test("IVF_PQ composed (nprobe=4/8, m=8) ADC-in-lists + rerank: recall >= 0.6") {
    val cents = IvfIndex.trainKMeans(spark, base, nlist = 8)
    val index = IvfIndex.build(base, cents)
    val model = ProductQuant.train(spark, base, m = 8, ksub = 16)
    val got = IvfIndex.searchPq(queries, index, cents, model, K, nprobe = 4, reorderK = 50)
    assert(recall(got, truth) >= 0.6)
  }

  test("ensure_topk_full expands probing when probed lists cannot fill k") {
    import spark.implicits._
    // 3 tight clusters; the cluster nearest the query holds only 2 vectors
    val pts = Seq(
      (0L, Array(0f, 0f)), (1L, Array(0.1f, 0f)), // cluster A (near query)
      (10L, Array(10f, 10f)), (11L, Array(10.1f, 10f)), (12L, Array(10f, 10.1f)),
      (20L, Array(20f, 0f)), (21L, Array(20.1f, 0f)), (22L, Array(20f, 0.1f))
    ).toDF("id", "vec")
    val cents = Seq((0L, Array(0.05f, 0f)), (1L, Array(10f, 10f)), (2L, Array(20f, 0f)))
      .toDF("cluster_id", "centroid")
    val index = IvfIndex.build(pts, cents)
    val q = Seq((100L, Array(0f, 0f))).toDF("qid", "qvec")
    val bare = IvfIndex.search(q, index, cents, k = 5, nprobe = 1)
    assert(bare.count() == 2) // probed list holds only 2 vectors
    val full = IvfIndex.search(q, index, cents, k = 5, nprobe = 1, ensureTopkFull = true)
    assert(full.count() == 5)
    // build-time metadata path: same expansion from the persisted sizes
    val sizes = IvfIndex.listSizes(index)
    val viaMeta = IvfIndex.search(q, index, cents, k = 5, nprobe = 1,
      ensureTopkFull = true, listSizes = Some(sizes))
    assert(viaMeta.count() == 5)
    // the metadata is AUTHORITATIVE: inflated sizes suppress expansion,
    // proving the search reads metadata and never re-aggregates the index
    val inflated = sizes.select(col("cluster_id"), (col("n") + 100L).as("n"))
    val lied = IvfIndex.search(q, index, cents, k = 5, nprobe = 1,
      ensureTopkFull = true, listSizes = Some(inflated))
    assert(lied.count() == 2)
  }

  test("graph beam search (degree 5, ef=32, 4 hops): recall >= 0.6 (ANN floor)") {
    val all = Tables
      .embeddings(spark, sf0001)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val graph = BruteForce
      .knnFused(all, base, 5, Metric.L2, excludeSelf = true)
      .select(col("qid").as("src"), col("nid").as("dst"))
      .cache()
    val entries = Tables
      .embeddings(spark, sf0001)
      .filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("nid"))
    val got = GraphSearch.beamSearch(graph, base, queries, entries, K, ef = 32, iters = 4)
    assert(recall(got, truth) >= 0.6)
    graph.unpersist()
  }

  test("converged beam (adaptive termination) >= fixed-hop recall and stops early") {
    val all = Tables
      .embeddings(spark, sf0001)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val graph = BruteForce
      .knnFused(all, base, 5, Metric.L2, excludeSelf = true)
      .select(col("qid").as("src"), col("nid").as("dst"))
      .cache()
    val entries = Tables
      .embeddings(spark, sf0001)
      .filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("nid"))
    val fixed = GraphSearch.beamSearch(graph, base, queries, entries, K, ef = 32, iters = 4)
    val conv = GraphSearch.beamSearchConverged(graph, base, queries, entries, K, ef = 32)
    // the fixpoint walk runs hops until no frontier improves — it can only
    // see MORE of the graph than any fixed unrolling
    assert(recall(conv, truth) >= recall(fixed, truth))
    assert(recall(conv, truth) >= 0.6)
    // terminates by convergence well before the safety bound
    assert(GraphSearch.lastConvergedHops > 0 && GraphSearch.lastConvergedHops < 16,
      s"took ${GraphSearch.lastConvergedHops} hops")
    graph.unpersist()
  }

  test("quantized graph beam (HNSW_SQ/PQ analogs) + exact refine: recall >= 0.6") {
    val all = Tables
      .embeddings(spark, sf0001)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val graph = BruteForce
      .knnFused(all, base, 5, Metric.L2, excludeSelf = true)
      .select(col("qid").as("src"), col("nid").as("dst"))
      .cache()
    val entries = Tables
      .embeddings(spark, sf0001)
      .filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("nid"))
    val stats = Quantization.sq8Train(base)
    val sqTier = base
      .crossJoin(broadcast(stats))
      .select(col("id"),
        Quantization.sq8Recon(
          Quantization.sq8Code(col("vec"), col("mn"), col("mx")),
          col("mn"), col("mx")).as("vec"))
    val gotSq = GraphSearch.beamSearchRefined(
      graph, sqTier, base, queries, entries, K, ef = 32, iters = 4)
    assert(recall(gotSq, truth) >= 0.6)
    val model = ProductQuant.train(spark, base, m = 8, ksub = 16)
    val pqTier = base.select(col("id"),
      ProductQuant.reconExpr(ProductQuant.encodeExpr(col("vec"), model), model).as("vec"))
    val gotPq = GraphSearch.beamSearchRefined(
      graph, pqTier, base, queries, entries, K, ef = 32, iters = 4)
    assert(recall(gotPq, truth) >= 0.6)
    // PRQ: trained stage-2 on the stage-1 residuals — the two-stage recon
    // tier is strictly closer to the raw vectors, so the floor holds
    val m2 = ProductQuant.train(spark, ProductQuant.residualFrame(base, model),
      m = 8, ksub = 16)
    val gotPrq = GraphSearch.beamSearchRefined(
      graph, ProductQuant.prqReconTier(base, model, m2), base, queries, entries,
      K, ef = 32, iters = 4)
    assert(recall(gotPrq, truth) >= 0.6)
    graph.unpersist()
  }

  test("DiskANN (trained PQ, L=32, 3 hops): recall >= 0.6 (ANN floor)") {
    val idx = graft.IndexFactory
      .build(spark, "DISKANN", base, Metric.L2, nlist = 8, reorderK = 32)
      .asInstanceOf[DiskAnnIndex]
    val got = idx.search(queries, K, None)
    assert(recall(got, truth) >= 0.6)
  }

  test("normalize-then-IP reproduces the cosine ranking (recall >= 0.9)") {
    import graft.functions.VectorFunctions.{normL2, normalizeL2Pre}
    val qn = queries
      .select(col("qid"), col("qvec"), normL2(col("qvec")).as("_n"))
      .select(col("qid"), normalizeL2Pre(col("qvec"), col("_n")).as("qvec"))
    val bn = base
      .select(col("id"), col("vec"), normL2(col("vec")).as("_n"))
      .select(col("id"), normalizeL2Pre(col("vec"), col("_n")).as("vec"))
    val ipArm = BruteForce.knn(qn, bn, K, Metric.IP, roundDist = Some(4))
    val cosArm = BruteForce.knn(queries, base, K, Metric.Cosine, roundDist = Some(4))
    // set-level agreement: the two formulations differ only in fp
    // summation shape, so 4dp boundary ties may swap the tail rank
    assert(recall(ipArm, cosArm) >= 0.9)
  }

  test("DiskANN over the IVF-built graph (scalable build, no all-pairs): recall >= 0.6") {
    val cents = IvfIndex.trainKMeans(spark, base, nlist = 8)
    val graph = GraphSearch.knnGraphIvf(base, cents, degree = 5, nprobe = 2)
    val model = ProductQuant.train(spark, base, m = 8, ksub = 16)
    val entries = IvfIndex
      .search(cents.select(col("cluster_id").as("qid"), col("centroid").as("qvec")),
        IvfIndex.build(base, cents), cents, k = 1, nprobe = 1)
      .select(col("nid")).distinct()
    val coded = base.select(col("id"),
      ProductQuant.encodeExpr(col("vec"), model).as("codes"))
    val idx = new DiskAnnIndex(graph, coded, base, entries, model,
      searchListSize = 32, beamIters = 4)
    assert(recall(idx.search(queries, K, None), truth) >= 0.6)
  }
}
