package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Product quantization — the quantizer of IVF_PQ (`src/index/ivf/ivf.cc`,
  * PQ params m/nbits in `benchmark_float_qps.cpp:400-401`): split each
  * vector into `m` subspaces, k-means each subspace into `ksub` codewords,
  * store one code per subspace, search with an asymmetric-distance LUT
  * (per-query distances to every codeword, summed by code lookup).
  *
  * Spark shape: the codebook is a tiny driver-side model (m×ksub×dsub
  * floats) embedded as literals into static, codegen'd expression trees —
  * encode and LUT are pure map-side projections; no join or shuffle touches
  * the codebook. This build uses nbits=4 (ksub=16) so the per-row
  * expression tree stays compact; the structure is identical for nbits=8.
  *
  * Training is k-means (seeded, but not SQL-reproducible), so PQ is
  * recall-gated in ScalaTest rather than oracle-hash-gated — mirroring the
  * reference, whose PQ is tested by recall thresholds, not exact match
  * (`tests/ut/test_search.cc:28`).
  */
object ProductQuant {

  final case class PQModel(m: Int, ksub: Int, dsub: Int, codebooks: Array[Array[Array[Float]]])

  /** Train: per-subspace k-means over a bounded sample (`LocalKMeans` —
    * faiss trains PQ codebooks the same way, on a subsample, never the full
    * input). ONE collect feeds all m subspace fits: training cost is
    * O(sample·m·ksub), independent of table size. */
  def train(spark: SparkSession, base: DataFrame, m: Int = 8, ksub: Int = 16, seed: Long = 42L): PQModel = {
    val sample = LocalKMeans.sampleVectors(base, cap = ksub * 256)
    val dim = sample.head.length
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val dsub = dim / m
    // ksub is an upper bound: a degenerate sample (fewer distinct sub-
    // vectors than ksub) is clamped so every subspace codebook stays
    // rectangular and code values stay in [0, ksub)
    val kEff = math.min(ksub, sample.length)
    // the m subspace fits are independent and individually seeded, so they
    // parallelize across driver cores with a deterministic result; at
    // nbits=8 (ksub=256, 64Ki sample — the faiss max_points_per_centroid
    // contract) a sequential loop is minutes of single-threaded Lloyd
    val raw = new Array[Array[Array[Float]]](m)
    java.util.stream.IntStream.range(0, m).parallel().forEach { s =>
      val subPoints = sample.map(v => java.util.Arrays.copyOfRange(v, s * dsub, (s + 1) * dsub))
      raw(s) = LocalKMeans.fit(subPoints, kEff, maxIter = 15, seed = seed + s)
    }
    val kMin = raw.map(_.length).min
    PQModel(m, kMin, dsub, raw.map(_.take(kMin)))
  }

  /** Deterministic codebook (no training): codeword c of every subspace is
    * the matching slice of the base vector with id = c·step — the same
    * explicit-table device the IVF oracle queries use for centroids, so
    * the ADC+rerank MECHANICS are SQL-reproducible and hash-gated while
    * k-means-trained models stay recall-gated. */
  def explicitModel(
      base: DataFrame, // (id, vec)
      m: Int,
      ksub: Int,
      step: Long,
      idCol: String = "id",
      vecCol: String = "vec"
  ): PQModel = {
    val rows = base
      .filter(col(idCol) % step === 0 && col(idCol) < step * ksub)
      .orderBy(col(idCol))
      .select(col(vecCol))
      .collect()
      .map(_.getSeq[Float](0).toArray)
    require(rows.length == ksub, s"explicitModel: expected $ksub codewords, got ${rows.length}")
    val dim = rows(0).length
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val dsub = dim / m
    val codebooks = Array.tabulate(m, ksub)((s, c) =>
      java.util.Arrays.copyOfRange(rows(c), s * dsub, (s + 1) * dsub))
    PQModel(m, ksub, dsub, codebooks)
  }

  /** Serialize the codebooks (BinarySet analog, `index_node.h:371-401`):
    * a meta row + one row per (subspace, codeword). */
  def saveModel(spark: SparkSession, model: PQModel, dir: String): Unit = {
    import spark.implicits._
    Seq((model.m, model.ksub, model.dsub)).toDF("m", "ksub", "dsub")
      .write.mode("overwrite").parquet(s"$dir/meta")
    val rows = for { s <- 0 until model.m; c <- 0 until model.ksub }
      yield (s, c, model.codebooks(s)(c).toSeq)
    rows.toDF("s", "c", "centroid").write.mode("overwrite").parquet(s"$dir/codebooks")
  }

  /** Deserialize a model written by [[saveModel]] — search-identical. */
  def loadModel(spark: SparkSession, dir: String): PQModel = {
    val meta = spark.read.parquet(s"$dir/meta").head()
    val (m, ksub, dsub) = (meta.getAs[Int]("m"), meta.getAs[Int]("ksub"), meta.getAs[Int]("dsub"))
    val codebooks = Array.ofDim[Array[Float]](m, ksub)
    spark.read.parquet(s"$dir/codebooks").collect().foreach { r =>
      codebooks(r.getAs[Int]("s"))(r.getAs[Int]("c")) = r.getSeq[Float](2).toArray
    }
    PQModel(m, ksub, dsub, codebooks)
  }

  /** Codes column: for each subspace, the index of the nearest codeword
    * (first-minimum ⇒ deterministic tie-break). */
  def encodeExpr(vec: Column, model: PQModel): Column =
    // native triple-loop kernel (graft.plans.PqEncode) — bit-identical to
    // the relational array_position(array_min) formulation it replaced,
    // whose O(m·ksub) expression NODES stopped JIT-compiling past ksub=16
    // (16,384 kernels per row at m=64/ksub=256; one partition measured
    // 24+ min of interpreted codegen)
    org.apache.spark.sql.GraftExpr.column(
      graft.plans.PqEncode(
        org.apache.spark.sql.GraftExpr.expression(vec),
        model.codebooks, model.m, model.ksub, model.dsub))

  /** Reconstructed vector from codes: the per-subspace codeword slices
    * concatenated in subspace order. L2 against a reconstruction equals
    * the ADC distance (sum of per-subspace codeword distances), so this
    * is the decode used by quantized-traversal paths that want plain
    * vector scoring over the coded tier. */
  def reconExpr(codes: Column, model: PQModel): Column = {
    val cb = typedlit(model.codebooks.map(_.map(_.toSeq).toSeq).toSeq)
    flatten(transform(codes, (c, s) => element_at(element_at(cb, s + 1), c + 1)))
  }

  /** Stage-2 residual frame for progressive/product-residual quantization
    * (the HNSW_PRQ quantizer family, `faiss_hnsw.cc:2928-2939`): each
    * row's stage-1 reconstruction subtracted from the raw vector, in
    * FLOAT. Float subtraction is correctly rounded on any engine, so
    * explicit stage-2 codebooks built from this frame remain
    * oracle-expressible. */
  def residualFrame(base: DataFrame, model: PQModel): DataFrame =
    base.select(col("id"),
      zip_with(col("vec"), reconExpr(encodeExpr(col("vec"), model), model),
        (a, b) => (a - b).cast("float")).as("vec"))

  /** Two-stage PRQ reconstruction tier (id, vec): stage-1 recon plus the
    * recon of the stage-1 residual under the stage-2 codebook. Staged
    * through intermediate columns: CollapseProject keeps multiply-
    * referenced non-trivial aliases staged, so the stage-1 tree is not
    * inlined into each of the stage-2 distance expressions. */
  def prqReconTier(base: DataFrame, m1: PQModel, m2: PQModel): DataFrame =
    base
      .withColumn("_r1", reconExpr(encodeExpr(col("vec"), m1), m1))
      .withColumn("_resid",
        zip_with(col("vec"), col("_r1"), (a, b) => (a - b).cast("float")))
      .withColumn("_r2", reconExpr(encodeExpr(col("_resid"), m2), m2))
      .select(col("id"),
        zip_with(col("_r1"), col("_r2"), (a, b) => (a + b).cast("float")).as("vec"))

  /** Driver-side per-query LUT — `lutExpr`'s arithmetic (per-(s, c)
    * double folds over the subspace slice) for the serving searchers
    * (IVF_PQ decode-inline scoring, the DiskANN beam). Bit-identical to
    * the Catalyst formulation by the shared fold order. */
  private[operators] def lutLocal(q: Array[Float], model: PQModel): Array[Array[Double]] = {
    val t = Array.ofDim[Double](model.m, model.ksub)
    var s = 0
    while (s < model.m) {
      var c = 0
      while (c < model.ksub) {
        val cw = model.codebooks(s)(c)
        var acc = 0.0d
        var j = 0
        while (j < model.dsub) {
          val d = q(s * model.dsub + j).toDouble - cw(j).toDouble
          acc += d * d
          j += 1
        }
        t(s)(c) = acc
        c += 1
      }
      s += 1
    }
    t
  }

  /** Per-query LUT for subspace s: distances to all ksub codewords. */
  private[operators] def lutExpr(qvec: Column, model: PQModel, s: Int): Column = {
    val sub = slice(qvec, s * model.dsub + 1, model.dsub)
    array((0 until model.ksub).map(c =>
      VectorFunctions.l2Sq(sub, typedlit(model.codebooks(s)(c).toSeq))): _*)
  }

  /** ADC candidate ranking: attach per-subspace LUTs to the query side,
    * join to coded rows (crossJoin, or equi-join on `joinKey` for the
    * IVF_PQ probed variant), top-reorderK by approx dist =
    * sqrt(Σ_s lut_s[code_s]). Query side must carry (qid, qvec[, key]). */
  def adcTopK(
      querySide: DataFrame,
      coded: DataFrame, // (id[, key], codes)
      model: PQModel,
      reorderK: Int,
      joinKey: Option[String] = None,
      roundDist: Option[Int] = Some(4)
  ): DataFrame = {
    val qWithLut = (0 until model.m).foldLeft(querySide)((df, s) =>
      df.withColumn(s"_lut$s", lutExpr(col("qvec"), model, s)))
    val adistSq = (0 until model.m)
      .map(s => element_at(col(s"_lut$s"), element_at(col("codes"), s + 1) + 1))
      .reduce(_ + _)
    val rawA = sqrt(adistSq)
    val adist = roundDist.map(n => round(rawA, n)).getOrElse(rawA)
    val joined = joinKey match {
      case Some(key) => broadcast(qWithLut).join(coded, key)
      case None => broadcast(qWithLut).crossJoin(coded)
    }
    BruteForce.topK(
      joined.select(col("qid"), col("id").as("nid"), adist.as("dist")),
      reorderK,
      ascending = true)
  }

  /** ADC kNN with exact rerank: approx top-reorderK, then exact L2 on
    * rejoined raw vectors, top-k. */
  def pqKnn(
      queries: DataFrame, // (qid, qvec)
      base: DataFrame, // (id, vec)
      model: PQModel,
      k: Int,
      reorderK: Int,
      roundDist: Option[Int] = Some(4)
  ): DataFrame = {
    val coded = base.select(col("id"), encodeExpr(col("vec"), model).as("codes"))
    val cand = adcTopK(queries, coded, model, reorderK, None, roundDist)
      .join(broadcast(queries), "qid")
      .join(base.select(col("id").as("nid"), col("vec")), "nid")
    val rawE = VectorFunctions.l2(col("qvec"), col("vec"))
    val edist = roundDist.map(n => round(rawE, n)).getOrElse(rawE)
    BruteForce.topK(cand.select(col("qid"), col("nid"), edist.as("dist")), k, ascending = true)
  }
}
