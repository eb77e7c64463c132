package graft.operators

import org.apache.spark.sql.{Column, DataFrame}

/** Adaptive physical strategy: brute-force vs index probing — the
  * reference's graph-search fallback wrapper
  * (`src/index/hnsw/impl/IndexConditionalWrapper.cc:34-95`, thresholds at
  * `IndexConditionalWrapper.h:27-29`) and the filter-aware nprobe scaling
  * (`ivf.cc:750-760`), re-expressed as planner-side Scala: Catalyst prunes
  * partitions mechanically, but *choosing* the strategy from k, cardinality
  * and filter selectivity is engine logic.
  */
object AdaptiveSearch {

  /** k ≥ 0.5·surviving → linear scan wins (IndexConditionalWrapper.h:27). */
  val KRatioThreshold = 0.5

  /** filtered-out ratio ≥ 0.93 → linear scan over survivors (…h:28). */
  val FilterRatioKnn = 0.93

  /** Pure decision function (unit-tested): "bf" or "ivf". */
  def choose(k: Int, ntotal: Long, surviving: Long): String = {
    val filteredOut = if (ntotal == 0) 0.0 else 1.0 - surviving.toDouble / ntotal
    if (surviving == 0 || k >= KRatioThreshold * surviving || filteredOut >= FilterRatioKnn) "bf"
    else "ivf"
  }

  /** Filter-aware nprobe: scale so ~the same number of candidates survive
    * probing under the filter; clamped to [nprobe, nlist] (`ivf.cc:750-760`,
    * `ensure_topk_full` expands toward nlist). */
  def scaledNprobe(nprobe: Int, nlist: Int, ntotal: Long, surviving: Long): Int = {
    if (surviving == 0) return nlist
    val scaled = math.ceil(nprobe.toDouble * ntotal / surviving).toInt
    math.min(nlist, math.max(nprobe, scaled))
  }

  final case class Result(df: DataFrame, strategy: String, nprobeUsed: Int)

  /** Filtered kNN with the adaptive BF-vs-IVF choice. `index`/`centroids`
    * come from IvfIndex.build/trainKMeans; `filter` is the BitsetView
    * analog over base rows. Pass `stats` (ntotal, surviving) when known —
    * e.g. from index metadata — to skip the stats job entirely; otherwise
    * ONE job computes both counts (total and filter-surviving together,
    * never two passes). */
  def knn(
      queries: DataFrame,
      base: DataFrame, // (id, vec, ...)
      index: DataFrame, // (id, vec, cluster_id)
      centroids: DataFrame,
      k: Int,
      nprobe: Int,
      filter: Option[Column] = None,
      metric: Metric = Metric.L2,
      roundDist: Option[Int] = None,
      stats: Option[(Long, Long)] = None
  ): Result = {
    import org.apache.spark.sql.functions.{count, lit, when}
    val (ntotal, surviving) = stats.getOrElse {
      val survCol = filter.map(f => count(when(f, lit(1)))).getOrElse(count(lit(1)))
      val row = base.agg(count(lit(1)), survCol).head()
      (row.getLong(0), row.getLong(1))
    }
    choose(k, ntotal, surviving) match {
      case "bf" =>
        Result(BruteForce.knn(queries, base, k, metric, filter, roundDist), "bf", 0)
      case _ =>
        val nlist = centroids.count().toInt
        val np = filter.map(_ => scaledNprobe(nprobe, nlist, ntotal, surviving)).getOrElse(nprobe)
        val filteredIndex = filter.map(index.filter).getOrElse(index)
        Result(
          IvfIndex.search(queries, filteredIndex, centroids, k, np, metric, roundDist),
          "ivf",
          np)
    }
  }
}
