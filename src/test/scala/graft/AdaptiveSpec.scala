package graft

import org.apache.spark.sql.functions._

import graft.operators._
import graft.sources.Tables

/** BF-vs-index selection thresholds (IndexConditionalWrapper.h:27-29) and
  * filter-aware nprobe scaling (ivf.cc:750-760). */
class AdaptiveSpec extends SparkSpec {

  test("choose: k >= half the survivors -> brute force") {
    assert(AdaptiveSearch.choose(k = 500, ntotal = 1000, surviving = 1000) == "bf")
    assert(AdaptiveSearch.choose(k = 10, ntotal = 1000, surviving = 1000) == "ivf")
  }

  test("choose: filtered-out ratio >= 0.93 -> brute force over survivors") {
    assert(AdaptiveSearch.choose(k = 10, ntotal = 1000, surviving = 60) == "bf")
    assert(AdaptiveSearch.choose(k = 10, ntotal = 1000, surviving = 200) == "ivf")
  }

  test("scaledNprobe grows with filter selectivity, clamped to nlist") {
    assert(AdaptiveSearch.scaledNprobe(2, 16, 1000, 1000) == 2)
    assert(AdaptiveSearch.scaledNprobe(2, 16, 1000, 250) == 8)
    assert(AdaptiveSearch.scaledNprobe(2, 16, 1000, 10) == 16) // clamped
  }

  test("adaptive knn end-to-end: strategy switches with the filter") {
    val base = Tables
      .embeddings(spark, sf0001)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val queries = Tables
      .embeddings(spark, sf0001)
      .filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val cents = IvfIndex.trainKMeans(spark, base, nlist = 8)
    val index = IvfIndex.build(base, cents)

    val noFilter = AdaptiveSearch.knn(queries, base, index, cents, k = 5, nprobe = 2)
    assert(noFilter.strategy == "ivf" && noFilter.nprobeUsed == 2)
    assert(noFilter.df.count() > 0)

    // 96% filtered out -> brute force
    val heavy = AdaptiveSearch.knn(
      queries, base, index, cents, k = 5, nprobe = 2,
      filter = Some(col("id") % 25 === 0))
    assert(heavy.strategy == "bf")
    assert(heavy.df.count() > 0)

    // 50% filtered out -> ivf with scaled nprobe (2 * 2 = 4)
    val half = AdaptiveSearch.knn(
      queries, base, index, cents, k = 5, nprobe = 2,
      filter = Some(col("id") % 2 === 0))
    assert(half.strategy == "ivf" && half.nprobeUsed == 4)
  }
}

class ParamsSpec extends SparkSpec {
  import graft.operators.Params._

  test("knn params validate ranges like the reference config registry") {
    KnnParams(k = 10, nprobe = 4, nlist = 16).validated
    assertThrows[IllegalArgumentException](KnnParams(k = 0).validated)
    assertThrows[IllegalArgumentException](KnnParams(k = 10, metric = "nope").validated)
    assertThrows[IllegalArgumentException](KnnParams(k = 10, nprobe = 20, nlist = 16).validated)
    assertThrows[IllegalArgumentException](KnnParams(k = 10, reorderK = Some(5)).validated)
  }

  test("range params enforce per-metric bound direction (range_util.h:22-25)") {
    RangeParams("l2", radius = 2.0, rangeFilter = 0.0).validated
    RangeParams("ip", radius = 0.5, rangeFilter = 10.0).validated
    assertThrows[IllegalArgumentException](RangeParams("l2", 1.0, 2.0).validated)
    assertThrows[IllegalArgumentException](RangeParams("cosine", 0.9, 0.5).validated)
  }

  test("bm25 params") {
    Bm25Params().validated
    assertThrows[IllegalArgumentException](Bm25Params(b = 1.5).validated)
  }

  test("cagra params mirror gpu_raft_cagra_config.h ranges and itopk alignment") {
    CagraParams(k = 10).validated
    // metric gate: [L2 IP COSINE] only (CheckAndAdjust TRAIN branch)
    assertThrows[IllegalArgumentException](CagraParams(k = 10, metric = "hamming").validated)
    // degree relation: intermediate >= graph, both >= 1
    CagraParams(k = 10, intermediateGraphDegree = 64, graphDegree = 32).validated
    assertThrows[IllegalArgumentException](
      CagraParams(k = 10, intermediateGraphDegree = 16, graphDegree = 32).validated)
    assertThrows[IllegalArgumentException](CagraParams(k = 10, graphDegree = 0).validated)
    // declared ranges: team_size [0, 32], hashmap_max_fill_rate [0.1, 0.9]
    assertThrows[IllegalArgumentException](CagraParams(k = 10, teamSize = 33).validated)
    assertThrows[IllegalArgumentException](
      CagraParams(k = 10, hashmapMaxFillRate = 0.95).validated)
    // itopk auto-align: value_or(max(k, 64)) rounded up to 32
    assert(CagraParams(k = 10).alignedItopk == 64)
    assert(CagraParams(k = 100).alignedItopk == 128) // max(100,64)=100 → 128
    assert(CagraParams(k = 10, itopkSize = Some(33)).alignedItopk == 64)
    // search_width derived when absent: max((k-1)/32+1, 1)
    assert(CagraParams(k = 10).effectiveSearchWidth == 1)
    assert(CagraParams(k = 100).effectiveSearchWidth == 4)
    // explicit width must satisfy max(itopk, 32*width) >= k
    CagraParams(k = 64, itopkSize = Some(64), searchWidth = Some(2)).validated
    assertThrows[IllegalArgumentException](
      CagraParams(k = 100, itopkSize = Some(64), searchWidth = Some(1)).validated)
    // the build path enforces the degree relation (Cagra.build wires it)
    assertThrows[IllegalArgumentException] {
      import org.apache.spark.sql.functions._
      val base = Tables.embeddings(spark, sf0001).limit(8)
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      val cents = base.limit(1)
        .select(col("id").as("cluster_id"), col("vec").as("centroid"))
      Cagra.build(base, cents, intermediateDegree = 4, graphDegree = 8)
    }
  }
}
