package graft

import org.apache.spark.sql.functions._

import graft.operators._
import graft.sources.Tables

/** CAGRA CPU-adapt stand-in (`src/index/gpu_raft/gpu_raft_cagra.cc:38-60`
  * adapt_for_cpu; config `gpu_raft_cagra_config.h`): graph-optimization
  * invariants, factory arm, recall floor, save/load identity, capability
  * bits.
  */
class CagraSpec extends SparkSpec {

  private val K = 10

  private lazy val base = Tables
    .embeddings(spark, sf0001)
    .select(col("vec_id").as("id"), col("embedding").as("vec"))

  private lazy val queries = Tables
    .embeddings(spark, sf0001)
    .filter(col("vec_id") % 50 === 0)
    .select(col("vec_id").as("qid"), col("embedding").as("qvec"))

  private lazy val truth = BruteForce.knn(queries, base, K, Metric.L2).cache()

  private lazy val intermediate = BruteForce
    .knnFused(
      base.select(col("id").as("qid"), col("vec").as("qvec")),
      base, 8, Metric.L2, roundDist = Some(4), excludeSelf = true)
    .select(col("qid").as("src"), col("nid").as("dst"), col("dist"))
    .cache()

  test("optimize caps out-degree at graph_degree and keeps every node") {
    val g = Cagra.optimize(intermediate, graphDegree = 4).cache()
    val deg = g.groupBy("src").count()
    assert(deg.agg(max("count")).head().getLong(0) <= 4)
    assert(deg.count() == base.count()) // no node loses all out-edges
    assert(g.select(max("rnk")).head().getInt(0) <= 4)
  }

  test("optimize never prunes a node's nearest edge") {
    // rank-1 edges have no strictly-shorter two-hop route (either leg
    // would have to beat the minimum) — they must all survive into the
    // capped graph at rank 1
    val nearest = BruteForce
      .topK(intermediate, 1, ascending = true, qidCol = "src", idCol = "dst")
      .select(col("src"), col("dst"))
    val g = Cagra.optimize(intermediate, graphDegree = 4)
    assert(nearest.join(g.filter(col("rnk") === 1), Seq("src", "dst")).count()
      == nearest.count())
  }

  test("optimize adds reverse edges (the graph is not a plain kNN cap)") {
    // kNN graphs are asymmetric: some node d has an in-edge s→d while s is
    // not in d's own 8-NN. With a non-binding cap, the reverse edge d→s
    // must appear — edges the intermediate graph never contained
    val g = Cagra.optimize(intermediate, graphDegree = 1000)
    val reversedOnly = g
      .join(intermediate.select(col("src"), col("dst")), Seq("src", "dst"), "left_anti")
    assert(reversedOnly.count() > 0)
  }

  test("optimize under a similarity metric keeps the MOST similar edges") {
    // IP is descending (bigger = better): the re-cap must rank by max
    // similarity and the reverse-merge dedup must keep the max — a
    // min-oriented prune would keep the k LEAST-similar neighbors
    val interIp = BruteForce
      .knnFused(
        base.select(col("id").as("qid"), col("vec").as("qvec")),
        base, 8, Metric.IP, roundDist = Some(4), excludeSelf = true)
      .select(col("qid").as("src"), col("nid").as("dst"), col("dist"))
      .cache()
    val g = Cagra.optimize(interIp, graphDegree = 4, metric = Metric.IP).cache()
    // rank-1 out-edge per node is that node's max-similarity kept edge
    val rank1 = g.filter(col("rnk") === 1).select(col("src"), col("dist").as("d1"))
    val worse = g.join(rank1, "src").filter(col("dist") > col("d1"))
    assert(worse.count() == 0)
    // the most similar intermediate edge is never detourable (no leg can
    // beat the rank-1 similarity) — it must survive at rank 1
    val best = BruteForce
      .topK(interIp, 1, ascending = false, qidCol = "src", idCol = "dst")
      .select(col("src"), col("dst"))
    assert(best.join(g.filter(col("rnk") === 1), Seq("src", "dst")).count()
      == best.count())
    interIp.unpersist(); g.unpersist()
  }

  test("optimize rejects an alpha slack on a similarity metric") {
    // RobustPrune alpha is a distance-space rule; similarities can be
    // negative, where a multiplicative slack silently inverts
    val ex = intercept[IllegalArgumentException] {
      Cagra.optimize(intermediate, graphDegree = 4, alpha = 1.2, metric = Metric.IP)
    }
    assert(ex.getMessage.contains("alpha"))
  }

  test("graphBuild.intermediateDegree alone selects the diversified build") {
    // an explicit intermediate degree must not be silently discarded:
    // isPlain is false and the factory's CAGRA arm passes it through
    val gb = Params.GraphBuildParams(intermediateDegree = Some(12))
    assert(!gb.isPlain)
    assert(gb.interOr(4) == 12)
    assert(Params.GraphBuildParams().isPlain)
    assert(Params.GraphBuildParams().interOr(4) == 8)
    val idx = IndexFactory.build(spark, "GPU_CAGRA", base, Metric.L2,
      nlist = 8, roundDist = Some(4), reorderK = 32, graphBuild = gb)
    val got = idx.search(queries, K, None)
    assert(recall(got, truth) >= 0.6)
  }

  test("factory GPU_CAGRA: recall >= 0.6 (ANN floor) and meta JSON") {
    val idx = IndexFactory.build(spark, "GPU_CAGRA", base, Metric.L2,
      nlist = 8, roundDist = Some(4), reorderK = 32)
    val got = idx.search(queries, K, None)
    assert(recall(got, truth) >= 0.6)
    assert(idx.indexMetaJson.contains("\"index_type\":\"GPU_CAGRA\""))
    assert(idx.indexMetaJson.contains("\"itopk_size\":32"))
  }

  test("filtered search: filtered nodes route the walk but cannot answer") {
    val idx = IndexFactory.build(spark, "GPU_CAGRA", base, Metric.L2,
      nlist = 8, roundDist = Some(4), reorderK = 32)
    val got = idx.search(queries, K, Some(col("id") % 2 === 0)).cache()
    assert(got.filter(col("nid") % 2 =!= 0).count() == 0)
    assert(got.count() > 0)
  }

  test("save/load roundtrip is search-identical") {
    val dir = java.nio.file.Files.createTempDirectory("cagra").toString
    val idx = IndexFactory.build(spark, "GPU_CAGRA", base, Metric.L2,
      nlist = 8, roundDist = Some(4), reorderK = 32)
      .asInstanceOf[CagraIndex]
    idx.save(dir)
    val loaded = IndexFactory.loadCagra(spark, dir, Metric.L2,
      itopkSize = 32, beamIters = 4, roundDist = Some(4))
    val a = idx.search(queries, K, None).select("qid", "nid", "dist").collect().toSet
    val b = loaded.search(queries, K, None).select("qid", "nid", "dist").collect().toSet
    assert(a == b)
  }

  test("capability bits mirror the reference registration") {
    assert(Capabilities.supportsMetric("GPU_CAGRA", "l2"))
    assert(Capabilities.supportsMetric("GPU_CAGRA", "cosine"))
    assert(Capabilities.supportsMetric("GPU_RAFT_CAGRA", "ip"))
    assert(!Capabilities.supportsMetric("GPU_CAGRA", "hamming"))
    assert(Capabilities.supportsDataType("GPU_CAGRA", "fp32"))
    assert(!Capabilities.supportsDataType("GPU_CAGRA", "fp16"))
    assert(!Capabilities.hasRawData("GPU_CAGRA")) // gpu_raft.h:152-154
    assert(!Capabilities.supportsMmap("GPU_CAGRA"))
    assert(!Capabilities.supportsConcurrentAppend("GPU_CAGRA"))
  }
}
