package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sample-bounded, deterministic k-means for quantizer training.
  *
  * The reference never trains its coarse/PQ quantizers on the full input:
  * faiss clustering subsamples to `max_points_per_centroid` (256) points per
  * centroid before running Lloyd (the IVF Train path, `ivf.cc:440-654`,
  * delegates to faiss `Clustering`). The Spark rendering of that contract is
  * a bounded id-stride sample collected to the driver + a local Lloyd fit —
  * one Spark job regardless of table size, which is exactly what keeps
  * Train viable at 100 TB (training cost is O(sample), not O(table); only
  * the Add/assign phase is distributed).
  *
  * Determinism: id-stride sampling (not RNG partition sampling) and an LCG
  * seeded k-means++ init make the codebook a pure function of (data, seed),
  * mirroring the reference's seeded trainings (`tests/ut/utils.h:40-108`).
  * MLlib KMeans remains the public V15 `Cluster.train` verb; this trainer is
  * the internal quantizer path (IVF/PQ codebooks).
  */
object LocalKMeans {

  /** Deterministic bounded sample of a vector column: rows whose id HASH
    * lands on the stride — row-uniform for any id distribution (sparse,
    * skewed, or `monotonically_increasing_id`-style ids, where a raw
    * `id % stride` filter can return far fewer rows than cap or none at
    * all; the faiss subsample contract samples ROWS, not id values). One
    * count + one collect; falls back to `limit(cap)` if the hash-stride
    * sample comes back empty. */
  def sampleVectors(
      base: DataFrame, // (id, vec ARRAY<FLOAT>)
      cap: Int,
      idCol: String = "id",
      vecCol: String = "vec"
  ): Array[Array[Float]] = {
    val n = base.count()
    val stride = math.max(1L, (n + cap - 1) / cap)
    val sampled = base
      .filter(pmod(xxhash64(col(idCol)), lit(stride)) === 0)
      .select(col(vecCol))
      .collect()
      .map(_.getSeq[Float](0).toArray)
    if (sampled.nonEmpty) sampled
    else base.select(col(vecCol)).limit(cap).collect().map(_.getSeq[Float](0).toArray)
  }

  /** Exact-duplicate centroid removal (first occurrence kept). With few
    * distinct sample points, k-means++ and the empty-cluster reseed can
    * both emit duplicate centroids — `k` is an upper bound, as in faiss
    * clustering when `n < k`. */
  def distinctCentroids(centroids: Array[Array[Float]]): Array[Array[Float]] = {
    val seen = scala.collection.mutable.HashSet.empty[Seq[Float]]
    centroids.filter(c => seen.add(c.toSeq))
  }

  /** Best-of-`restarts` Lloyd (by total within-cluster SSE) — the sample is
    * driver-local, so restarts cost milliseconds and recover the quality of
    * MLlib's k-means|| init. Deterministic: seeds are seed, seed+1, …, the
    * restarts run in parallel (each is an independent pure function of its
    * seed) and the winner is picked by (SSE, restart index) exactly as the
    * sequential first-strict-improvement loop did. */
  def fit(points: Array[Array[Float]], k: Int, maxIter: Int = 15, seed: Long = 42L, restarts: Int = 4): Array[Array[Float]] = {
    require(restarts >= 1, s"fit needs at least one restart (got $restarts)")
    val fits = new Array[(Double, Array[Array[Float]])](restarts)
    java.util.stream.IntStream.range(0, restarts).parallel().forEach { r =>
      val c = fitOnce(points, k, maxIter, seed + r)
      // per-point nearest-centroid SSE: the point map is parallel (pure per
      // point), the reduction stays in index order — bit-identical to the
      // sequential fold
      val perPoint = new Array[Double](points.length)
      java.util.stream.IntStream.range(0, points.length).parallel().forEach { i =>
        val p = points(i)
        var m = Double.MaxValue
        var ci = 0
        while (ci < c.length) {
          var s = 0.0; var j = 0
          while (j < p.length) { val d = p(j) - c(ci)(j); s += d * d; j += 1 }
          if (s < m) m = s
          ci += 1
        }
        perPoint(i) = m
      }
      var sse = 0.0
      var i = 0
      while (i < perPoint.length) { sse += perPoint(i); i += 1 }
      fits(r) = (sse, c)
    }
    var best = fits(0)._2
    var bestSse = fits(0)._1
    for (r <- 1 until restarts) if (fits(r)._1 < bestSse) { bestSse = fits(r)._1; best = fits(r)._2 }
    best
  }

  /** Lloyd with k-means++ init over local points; returns k centroids.
    * Empty clusters are reseeded to the point farthest from its centroid
    * (the reference's faiss clustering does the same split-reassign). */
  private def fitOnce(points: Array[Array[Float]], k: Int, maxIter: Int, seed: Long): Array[Array[Float]] = {
    require(points.nonEmpty, "k-means on empty sample")
    val n = points.length
    val dim = points(0).length
    var rng = seed

    def nextDouble(): Double = { // LCG (Numerical Recipes) — deterministic
      rng = rng * 6364136223846793005L + 1442695040888963407L
      ((rng >>> 11).toDouble) / (1L << 53).toDouble
    }

    def d2(a: Array[Float], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < dim) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }

    // k-means++ seeding. The per-point distances to the newest center are
    // pure and compute in parallel; the minD update + running total stay
    // in index order, so the picked seeds are bit-identical to the
    // sequential loop (the n·k seeding pass dominates at ksub=256-scale
    // codebooks and nlist=1024 coarse quantizers).
    val centers = Array.ofDim[Double](k, dim)
    val first = points((nextDouble() * n).toInt.min(n - 1))
    for (j <- 0 until dim) centers(0)(j) = first(j)
    val minD = Array.fill(n)(Double.MaxValue)
    val dTmp = new Array[Double](n)
    for (c <- 1 until k) {
      java.util.stream.IntStream.range(0, n).parallel()
        .forEach(i => dTmp(i) = d2(points(i), centers(c - 1)))
      var total = 0.0
      var i = 0
      while (i < n) {
        if (dTmp(i) < minD(i)) minD(i) = dTmp(i)
        total += minD(i)
        i += 1
      }
      var target = nextDouble() * total
      var pick = 0
      i = 0
      while (i < n && target > 0) { target -= minD(i); if (target > 0) pick = (i + 1).min(n - 1); i += 1 }
      for (j <- 0 until dim) centers(c)(j) = points(pick)(j)
    }

    // Lloyd. The n·k·dim assignment pass is pure per point and runs in
    // parallel into a scratch array; the changed test and the centroid
    // sums accumulate sequentially in index order afterwards — assignment,
    // iteration count, and every double sum are bit-identical to the
    // sequential loop.
    val assign = Array.fill(n)(-1)
    val newAssign = new Array[Int](n)
    var iter = 0
    var changed = true
    while (iter < maxIter && changed) {
      changed = false
      java.util.stream.IntStream.range(0, n).parallel().forEach { i =>
        var best = 0; var bestD = Double.MaxValue
        var c = 0
        while (c < k) {
          val d = d2(points(i), centers(c))
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        newAssign(i) = best
      }
      var i = 0
      while (i < n) {
        if (newAssign(i) != assign(i)) { assign(i) = newAssign(i); changed = true }
        i += 1
      }
      val sums = Array.ofDim[Double](k, dim)
      val counts = Array.fill(k)(0)
      i = 0
      while (i < n) {
        val c = assign(i); counts(c) += 1
        var j = 0
        while (j < dim) { sums(c)(j) += points(i)(j); j += 1 }
        i += 1
      }
      for (c <- 0 until k) {
        if (counts(c) > 0) {
          for (j <- 0 until dim) centers(c)(j) = sums(c)(j) / counts(c)
        } else {
          // reseed empty cluster at the point farthest from its center
          var far = 0; var farD = -1.0
          var p = 0
          while (p < n) {
            val d = d2(points(p), centers(assign(p)))
            if (d > farD) { farD = d; far = p }
            p += 1
          }
          for (j <- 0 until dim) centers(c)(j) = points(far)(j)
          changed = true
        }
      }
      iter += 1
    }
    centers.map(_.map(_.toFloat))
  }
}
