package graft.operators

/** Validated search/build parameters — the reference's declarative config
  * registry with per-key type/range checks (`include/knowhere/config.h:
  * 346-582`; `BaseConfig` fields at `config.h:585-623`; error codes
  * `expected.h:23-50` → IllegalArgumentException here).
  */
object Params {

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
}
