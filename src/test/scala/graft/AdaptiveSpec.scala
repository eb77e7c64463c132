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
}
