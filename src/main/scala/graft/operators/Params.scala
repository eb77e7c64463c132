package graft.operators

/** Validated search/build parameters — the reference's declarative config
  * registry with per-key type/range checks (`include/knowhere/config.h:
  * 346-582`; `BaseConfig` fields at `config.h:585-623`; error codes
  * `expected.h:23-50` → IllegalArgumentException here).
  */
object Params {

  /** Graph-construction quality knobs shared by the graph-family factory
    * arms (HNSW*, DISKANN, GPU_CAGRA). The defaults reproduce the plain
    * IVF-bucketed kNN graph bit-for-bit; turning the knobs buys the
    * published navigability fixes:
    *  - `descentRounds` — NN-descent refinement rounds over the
    *    intermediate graph (Dong et al. 2011; the reference's CAGRA
    *    builder: `gpu_raft_cagra_config.h` build_algo=NN_DESCENT,
    *    nn_descent_niter);
    *  - `alpha` — the Vamana RobustPrune slack on the detour prune
    *    (DiskANN's build alpha, `src/index/diskann/diskann.cc` config);
    *    α<1 prunes more redundant in-clique edges so the degree re-cap
    *    admits longer-range survivors;
    *  - `intermediateDegree` — candidate-graph degree before pruning
    *    (CAGRA's intermediate_graph_degree; None = 2× the arm's final
    *    degree, the reference's default ratio).
    * A plain kNN graph's edges all point into the local clique and its
    * beam recall saturates — measured 0.651 at ef=4096, nb=1M — while the
    * diversified build reaches the protocol targets at the same degree. */
  final case class GraphBuildParams(
      descentRounds: Int = 0,
      sampleDegree: Int = 8,
      alpha: Double = 1.0,
      intermediateDegree: Option[Int] = None
  ) {
    /** True when the knobs reproduce the plain bucketed kNN graph. An
      * explicit `intermediateDegree` alone already selects the diversified
      * build (candidate graph at that degree, detour-pruned down to the
      * arm's final degree) — it must not be silently discarded. */
    def isPlain: Boolean =
      descentRounds == 0 && alpha == 1.0 && intermediateDegree.isEmpty
    def interOr(finalDegree: Int): Int =
      intermediateDegree.getOrElse(2 * finalDegree)
  }

  final case class KnnParams(
      k: Int,
      metric: String = "l2",
      nprobe: Int = 1,
      nlist: Int = 1,
      reorderK: Option[Int] = None,
      roundDist: Option[Int] = Some(4)
  ) {
    def validated: KnnParams = {
      require(k >= 1 && k <= 16384, s"invalid param k=$k, expected [1, 16384]")
      require(
        Set("l2", "l2sq", "ip", "cosine", "hamming", "jaccard").contains(metric.toLowerCase),
        s"invalid param metric=$metric")
      require(nlist >= 1 && nlist <= 65536, s"invalid param nlist=$nlist, expected [1, 65536]")
      require(nprobe >= 1 && nprobe <= nlist, s"invalid param nprobe=$nprobe, expected [1, nlist=$nlist]")
      reorderK.foreach(r => require(r >= k, s"invalid param reorderK=$r, expected >= k=$k"))
      this
    }
  }

  final case class RangeParams(
      metric: String,
      radius: Double,
      rangeFilter: Double
  ) {
    /** Bound direction flips for similarity metrics
      * (`include/knowhere/range_util.h:22-25`). */
    def validated: RangeParams = {
      val similarity = Set("ip", "cosine").contains(metric.toLowerCase)
      if (similarity)
        require(rangeFilter > radius,
          s"invalid range for similarity metric: need rangeFilter > radius, got ($radius, $rangeFilter)")
      else
        require(rangeFilter < radius,
          s"invalid range for distance metric: need rangeFilter < radius, got ($rangeFilter, $radius)")
      this
    }
  }

  final case class Bm25Params(k1: Double = 1.2, b: Double = 0.75) {
    def validated: Bm25Params = {
      require(k1 >= 0.0 && k1 <= 3.0, s"invalid param k1=$k1, expected [0, 3]")
      require(b >= 0.0 && b <= 1.0, s"invalid param b=$b, expected [0, 1]")
      this
    }
  }

  /** CAGRA build/search knobs mirroring the reference's declared fields,
    * defaults, and ranges (`src/index/gpu_raft/gpu_raft_cagra_config.h:
    * 27-149`): graph degrees with their build-time relation, team_size
    * range [0, 32], hashmap_max_fill_rate range [0.1, 0.9], the L2/IP/
    * COSINE train-metric gate, and the search-time itopk auto-alignment
    * (itopk rounded up to the 32-wide kAlignFactor, search_width derived
    * when absent, and the max(itopk, 32·search_width) ≥ k check). */
  final case class CagraParams(
      k: Int,
      metric: String = "l2",
      intermediateGraphDegree: Int = 128,
      graphDegree: Int = 64,
      itopkSize: Option[Int] = None,
      searchWidth: Option[Int] = None,
      teamSize: Int = 0,
      hashmapMaxFillRate: Double = 0.5
  ) {
    import CagraParams.{AlignFactor, DefaultItopk, DefaultSearchWidth}

    def validated: CagraParams = {
      require(
        Set("l2", "ip", "cosine").contains(metric.toLowerCase),
        s"metric type $metric not found or not supported, supported: [L2 IP COSINE]")
      require(graphDegree >= 1,
        s"invalid param graph_degree=$graphDegree, expected >= 1")
      require(intermediateGraphDegree >= graphDegree,
        s"invalid param intermediate_graph_degree=$intermediateGraphDegree, " +
          s"expected >= graph_degree=$graphDegree")
      require(teamSize >= 0 && teamSize <= 32,
        s"invalid param team_size=$teamSize, expected [0, 32]")
      require(hashmapMaxFillRate >= 0.1 && hashmapMaxFillRate <= 0.9,
        s"invalid param hashmap_max_fill_rate=$hashmapMaxFillRate, expected [0.1, 0.9]")
      require(k >= 1, s"invalid param k=$k, expected >= 1")
      val aligned = alignedItopk
      searchWidth match {
        case Some(w) =>
          require(w >= 1, s"invalid param search_width=$w, expected >= 1")
          require(math.max(aligned, AlignFactor * w) >= k,
            s"max((itopk_size + 31)// 32, search_width) * 32< topk")
        case None => ()
      }
      this
    }

    /** itopk_size after the reference's kAlignFactor round-up. */
    def alignedItopk: Int = {
      val v = itopkSize.getOrElse(math.max(k, DefaultItopk))
      (v + AlignFactor - 1) / AlignFactor * AlignFactor
    }

    /** search_width after the reference's derivation when absent. */
    def effectiveSearchWidth: Int =
      searchWidth.getOrElse(math.max((k - 1) / AlignFactor + 1, DefaultSearchWidth))
  }

  object CagraParams {
    val AlignFactor = 32 // gpu_raft_cagra_config.h:28
    val DefaultItopk = 64 // gpu_raft_cagra_config.h:29
    val DefaultSearchWidth = 1 // gpu_raft_cagra_config.h:27
  }
}
