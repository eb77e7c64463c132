package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators._

/** Unified index facade — the reference's `Index<IndexNode>` handle
  * (`include/knowhere/index/index.h:23-219`: config validation, dispatch,
  * capability probes) plus the factory (`src/index/index_factory.cc:45-70`).
  * Every verb returns a DataFrame; persistence is parquet (BinarySet ↔
  * partitioned tables, `index_node.h:371-401`).
  */
trait VectorIndex {
  def indexType: String
  def count: Long
  def dim: Int
  def hasRawData: Boolean = Capabilities.hasRawData(indexType)
  def search(queries: DataFrame, k: Int, filter: Option[Column] = None): DataFrame
  def rangeSearch(queries: DataFrame, radius: Double, rangeFilter: Double,
      filter: Option[Column] = None): DataFrame
  def getVectorByIds(ids: DataFrame): DataFrame
  /** Serialize: write the index tables under `dir`. */
  def save(dir: String): Unit
  /** GetIndexMeta (V10, `index_node.h:362-363`): Feder-style JSON describe
    * — index type, cardinality, dim. Subclasses append structure. */
  def indexMetaJson: String =
    s"""{"index_type":"$indexType","count":$count,"dim":$dim}"""
}

/** FLAT: the base table itself is the index (`src/index/flat/flat.cc`). */
final class FlatIndex(
    val base: DataFrame, // (id, vec)
    val metric: Metric,
    roundDist: Option[Int] = None
) extends VectorIndex {
  override def indexType: String = "FLAT"
  override lazy val count: Long = base.count()
  override lazy val dim: Int =
    base.select(max(size(col("vec")))).head().getInt(0)

  override def search(queries: DataFrame, k: Int, filter: Option[Column]): DataFrame =
    BruteForce.knn(queries, base, k, metric, filter, roundDist)

  override def rangeSearch(queries: DataFrame, radius: Double, rangeFilter: Double,
      filter: Option[Column]): DataFrame =
    BruteForce.rangeSearch(queries, base, metric, radius, rangeFilter, filter, roundDist)

  override def getVectorByIds(ids: DataFrame): DataFrame =
    BruteForce.getVectorByIds(ids, base)

  override def save(dir: String): Unit =
    base.write.mode("overwrite").parquet(s"$dir/base")
}

/** FLAT over TRUE half-width storage — the factory's per-datatype key
  * (`IndexFactory::Create<fp16>`, `include/knowhere/utils.h:101-104`
  * "_fp16"/"_bf16" suffixes) materialized as 2-byte-packed BINARY columns
  * (`graft.plans.Half`, `operands.h:48-147`). Search decodes inline in
  * codegen ([[BruteForce.knnPacked]]); serialization writes the packed
  * table — half the bytes of the fp32 artifact at rest AND in scan.
  * Range search and GetVectorByIds serve from the exact fp32 decode
  * (every half value is exact in fp32 — same results as the value-grid
  * rendering). */
final class PackedFlatIndex(
    val packed: DataFrame, // (id, vec BINARY)
    val metric: Metric,
    val bf16: Boolean,
    roundDist: Option[Int] = None
) extends VectorIndex {
  import graft.functions.VectorFunctions.{packBf16, packFp16, unpackBf16, unpackFp16}

  override def indexType: String = "FLAT"
  def elementType: String = if (bf16) "bf16" else "fp16"
  override lazy val count: Long = packed.count()
  override lazy val dim: Int =
    packed.select(max(length(col("vec")))).head().getInt(0) / 2

  private def packQ(queries: DataFrame): DataFrame = queries.select(
    col("qid"),
    (if (bf16) packBf16(col("qvec")) else packFp16(col("qvec"))).as("qvec"))

  private def unpacked: DataFrame = packed.select(
    col("id"),
    (if (bf16) unpackBf16(col("vec")) else unpackFp16(col("vec"))).as("vec"))

  override def search(queries: DataFrame, k: Int, filter: Option[Column]): DataFrame =
    BruteForce.knnPacked(packQ(queries), packed, k, metric, bf16, filter, roundDist)

  override def rangeSearch(queries: DataFrame, radius: Double, rangeFilter: Double,
      filter: Option[Column]): DataFrame =
    BruteForce.rangeSearch(queries, unpacked, metric, radius, rangeFilter, filter, roundDist)

  override def getVectorByIds(ids: DataFrame): DataFrame =
    BruteForce.getVectorByIds(ids, unpacked)

  override def save(dir: String): Unit =
    packed.write.mode("overwrite").parquet(s"$dir/base_packed")

  override def indexMetaJson: String =
    s"""{"index_type":"$indexType","element_type":"$elementType",""" +
      s""""count":$count,"dim":$dim}"""
}

object PackedFlatIndex {

  /** Pack an (id, vec ARRAY<FLOAT|DOUBLE>) frame into the 2-byte handle. */
  def fromArrays(base: DataFrame, metric: Metric, bf16: Boolean,
      roundDist: Option[Int] = None): PackedFlatIndex = {
    import graft.functions.VectorFunctions.{packBf16, packFp16}
    new PackedFlatIndex(
      base.select(col("id"),
        (if (bf16) packBf16(col("vec")) else packFp16(col("vec"))).as("vec")),
      metric, bf16, roundDist)
  }

  def load(spark: SparkSession, dir: String, metric: Metric, bf16: Boolean,
      roundDist: Option[Int] = None): PackedFlatIndex =
    new PackedFlatIndex(spark.read.parquet(s"$dir/base_packed"), metric, bf16, roundDist)
}

/** IVF_FLAT over TRUE half-width packed lists — the factory's fp16/bf16
  * element key on the IVF kind (`IndexFactory::Create<fp16>("IVF_FLAT")`;
  * lists store 2-byte elements per `operands.h:48-147`, compute widens to
  * fp32). Probing stays on the broadcast-sized fp32 centroid arrays; the
  * probed scan reads BINARY(dim*2) lists through the decode-inline
  * kernels ([[IvfIndex.searchPacked]]). */
final class PackedIvfIndex(
    val index: DataFrame, // (id, vec BINARY, cluster_id)
    val centroids: DataFrame, // (cluster_id, centroid ARRAY — grid values)
    val metric: Metric,
    val nprobe: Int,
    val bf16: Boolean,
    roundDist: Option[Int] = None
) extends VectorIndex {
  import graft.functions.VectorFunctions.{unpackBf16, unpackFp16}

  override def indexType: String = "IVF_FLAT"
  def elementType: String = if (bf16) "bf16" else "fp16"
  override lazy val count: Long = index.count()
  override lazy val dim: Int =
    index.select(max(length(col("vec")))).head().getInt(0) / 2

  private def unpacked: DataFrame = index.select(
    col("id"),
    (if (bf16) unpackBf16(col("vec")) else unpackFp16(col("vec"))).as("vec"))

  override def search(queries: DataFrame, k: Int, filter: Option[Column]): DataFrame = {
    val filtered = filter.map(index.filter).getOrElse(index)
    IvfIndex.searchPacked(queries, filtered, centroids, k, nprobe, metric, bf16, roundDist)
  }

  override def rangeSearch(queries: DataFrame, radius: Double, rangeFilter: Double,
      filter: Option[Column]): DataFrame =
    BruteForce.rangeSearch(queries, unpacked, metric, radius, rangeFilter, filter, roundDist)

  override def getVectorByIds(ids: DataFrame): DataFrame =
    BruteForce.getVectorByIds(ids, unpacked)

  override def save(dir: String): Unit = {
    index.write.mode("overwrite").partitionBy("cluster_id").parquet(s"$dir/lists_packed")
    centroids.write.mode("overwrite").parquet(s"$dir/centroids")
  }

  override def indexMetaJson: String =
    s"""{"index_type":"$indexType","element_type":"$elementType",""" +
      s""""count":$count,"dim":$dim,"nprobe":$nprobe}"""
}

object PackedIvfIndex {

  def load(spark: SparkSession, dir: String, metric: Metric, bf16: Boolean,
      nprobe: Int = 4, roundDist: Option[Int] = None): PackedIvfIndex =
    new PackedIvfIndex(
      spark.read.parquet(s"$dir/lists_packed"),
      spark.read.parquet(s"$dir/centroids"),
      metric, nprobe, bf16, roundDist)
}

/** IVF_FLAT: coarse-quantized lists, probed search (`src/index/ivf/ivf.cc`). */
final class IvfFlatIndex(
    val index: DataFrame, // (id, vec, cluster_id)
    val centroids: DataFrame, // (cluster_id, centroid)
    val metric: Metric,
    val nprobe: Int,
    roundDist: Option[Int] = None,
    // build-time per-list populations (IvfIndex.listSizes) — the
    // ensure_topk_full metadata; None for ad-hoc frames
    val listSizesMeta: Option[DataFrame] = None,
    // IVF_FLAT_CC shares this artifact (index_param.h:30 — the CC variant
    // is the same structure with a concurrent growing segment; here the
    // micro-batch append path, streaming/StreamingIndex.scala)
    typeName: String = "IVF_FLAT"
) extends VectorIndex {
  override def indexType: String = typeName
  override lazy val count: Long = index.count()
  override lazy val dim: Int = index.select(max(size(col("vec")))).head().getInt(0)

  override def search(queries: DataFrame, k: Int, filter: Option[Column]): DataFrame = {
    val filtered = filter.map(index.filter).getOrElse(index)
    IvfIndex.search(queries, filtered, centroids, k, nprobe, metric, roundDist,
      listSizes = if (filter.isEmpty) listSizesMeta else None)
  }

  /** ensure_topk_full search: probe expansion reads the build-time list
    * populations, never a full-index aggregate. */
  def searchTopkFull(queries: DataFrame, k: Int): DataFrame =
    IvfIndex.search(queries, index, centroids, k, nprobe, metric, roundDist,
      ensureTopkFull = true, listSizes = listSizesMeta)

  /** Concurrent-append analog — the CC growing-segment semantics
    * (IVF_FLAT_CC, `index_param.h:30`; the reference's CC kinds append
    * into FIXED coarse lists, no retrain): assign the new rows to the
    * existing centroids and return a handle over the union. The streaming
    * micro-batch path (streaming/StreamingIndex.startAppendIvf) is the
    * continuous twin of this batch verb. */
  def append(rows: DataFrame): IvfFlatIndex = {
    val merged = index.unionByName(IvfIndex.build(rows, centroids, roundDist, metric))
    new IvfFlatIndex(merged, centroids, metric, nprobe, roundDist,
      listSizesMeta = listSizesMeta.map(_ => IvfIndex.listSizes(merged)),
      typeName = indexType)
  }

  /** Segment MERGE — the compaction verb the reference's host system runs
    * over sealed segments built against one trained codebook (the CC
    * family's lists are FIXED at train time, `ivf.cc:1250-1262`, so two
    * same-codebook indexes merge list-wise — a union, no retrain; the
    * same contract [[append]] rides for single rows). List-population
    * metadata is recomputed from the union so `ensure_topk_full` stays
    * build-time. */
  def merge(other: IvfFlatIndex): IvfFlatIndex = {
    require(other.indexType == indexType && other.metric == metric,
      s"cannot merge $indexType/$metric with ${other.indexType}/${other.metric}")
    val merged = index.unionByName(other.index)
    new IvfFlatIndex(merged, centroids, metric, nprobe, roundDist,
      listSizesMeta = listSizesMeta.map(_ => IvfIndex.listSizes(merged)),
      typeName = indexType)
  }

  /** Range search scans all lists — nprobe=nlist, exact within bound
    * (`ivf.cc:854-868`). */
  override def rangeSearch(queries: DataFrame, radius: Double, rangeFilter: Double,
      filter: Option[Column]): DataFrame =
    BruteForce.rangeSearch(
      queries, index.select(col("id"), col("vec")), metric, radius, rangeFilter, filter, roundDist)

  override def getVectorByIds(ids: DataFrame): DataFrame =
    BruteForce.getVectorByIds(ids, index.select(col("id"), col("vec")))

  override def save(dir: String): Unit = {
    index.write.mode("overwrite").partitionBy("cluster_id").parquet(s"$dir/lists")
    centroids.write.mode("overwrite").parquet(s"$dir/centroids")
    listSizesMeta.foreach(_.write.mode("overwrite").parquet(s"$dir/list_sizes"))
  }

  /** Feder overview (`include/knowhere/feder/`, `test_feder.cc`): per-list
    * populations appended to the base meta — from the build-time metadata
    * when present, else one aggregation. */
  override def indexMetaJson: String = {
    val lists = listSizesMeta
      .getOrElse(index
        .groupBy(col("cluster_id"))
        .agg(org.apache.spark.sql.functions.count(lit(1)).as("n")))
      .orderBy(col("cluster_id"))
      .collect()
      .map(r => s"""{"list":${r.get(0)},"size":${r.getLong(1)}}""")
      .mkString("[", ",", "]")
    s"""{"index_type":"$indexType","count":$count,"dim":$dim,"nlist":${centroids.count()},"lists":$lists}"""
  }
}

/** IVF_SQ8: coarse lists + 8-bit scalar-quantized codes, SCANN-style exact
  * rerank (`ivf.cc:1244-1276`). The quantizer model (per-dim min/max) is a
  * build-time artifact persisted alongside the lists — search never
  * retrains. This is the reference's `with_raw_data` SCANN shape: raw
  * vectors ride alongside the codes (they power the exact rerank and
  * range search), so GetVectorByIds works — unlike the codes-only
  * reference IVF_SQ8 (`flat.cc:258-283`). */
final class IvfSq8Index(
    val index: DataFrame, // (id, vec, cluster_id)
    val centroids: DataFrame,
    val sq8Stats: DataFrame, // one row (mn ARRAY, mx ARRAY)
    val nprobe: Int,
    val reorderK: Int,
    roundDist: Option[Int] = None,
    typeName: String = "IVF_SQ8" // IVF_SQ_CC alias (index_param.h:34)
) extends VectorIndex {
  override def indexType: String = typeName
  override lazy val count: Long = index.count()
  override lazy val dim: Int = index.select(max(size(col("vec")))).head().getInt(0)

  override def search(queries: DataFrame, k: Int, filter: Option[Column]): DataFrame = {
    val filtered = filter.map(index.filter).getOrElse(index)
    IvfIndex.searchSq8(queries, filtered, centroids, k, nprobe, reorderK,
      roundDist, stats = Some(sq8Stats))
  }

  override def rangeSearch(queries: DataFrame, radius: Double, rangeFilter: Double,
      filter: Option[Column]): DataFrame =
    BruteForce.rangeSearch(
      queries, index.select(col("id"), col("vec")), Metric.L2, radius, rangeFilter,
      filter, roundDist)

  override def getVectorByIds(ids: DataFrame): DataFrame =
    BruteForce.getVectorByIds(ids, index.select(col("id"), col("vec")))

  override def save(dir: String): Unit = {
    index.write.mode("overwrite").partitionBy("cluster_id").parquet(s"$dir/lists")
    centroids.write.mode("overwrite").parquet(s"$dir/centroids")
    sq8Stats.write.mode("overwrite").parquet(s"$dir/sq8_stats")
  }
}

/** IVF_PQ: coarse lists + product-quantization codes with ADC + exact
  * rerank (`ivf.cc:1244-1276`; m/nbits per `benchmark_float_qps.cpp:
  * 400-401`). Codebooks persist with the lists. Like [[IvfSq8Index]],
  * this is a `with_raw_data` shape: raw vectors power the rerank/range
  * paths, so GetVectorByIds works. */
final class IvfPqIndex(
    val index: DataFrame, // (id, vec, cluster_id)
    val centroids: DataFrame,
    val model: ProductQuant.PQModel,
    val nprobe: Int,
    val reorderK: Int,
    roundDist: Option[Int] = None,
    // SCANN shares this artifact: the reference's SCANN is the
    // PQ-codes-plus-raw-refine configuration (`with_raw_data`) of the
    // same coarse+PQ structure (index_param.h:32 registration)
    typeName: String = "IVF_PQ"
) extends VectorIndex {
  override def indexType: String = typeName
  override lazy val count: Long = index.count()
  override lazy val dim: Int = index.select(max(size(col("vec")))).head().getInt(0)

  override def search(queries: DataFrame, k: Int, filter: Option[Column]): DataFrame = {
    val filtered = filter.map(index.filter).getOrElse(index)
    IvfIndex.searchPq(queries, filtered, centroids, model, k, nprobe, reorderK, roundDist)
  }

  override def rangeSearch(queries: DataFrame, radius: Double, rangeFilter: Double,
      filter: Option[Column]): DataFrame =
    BruteForce.rangeSearch(
      queries, index.select(col("id"), col("vec")), Metric.L2, radius, rangeFilter,
      filter, roundDist)

  override def getVectorByIds(ids: DataFrame): DataFrame =
    BruteForce.getVectorByIds(ids, index.select(col("id"), col("vec")))

  override def save(dir: String): Unit = {
    index.write.mode("overwrite").partitionBy("cluster_id").parquet(s"$dir/lists")
    centroids.write.mode("overwrite").parquet(s"$dir/centroids")
    ProductQuant.saveModel(index.sparkSession, model, s"$dir/pq")
  }
}

/** Factory — `(index_type, params) → index`, `index_factory.cc:45-70`. */
object IndexFactory {

  def build(
      spark: SparkSession,
      indexType: String,
      base: DataFrame, // (id, vec)
      metric: Metric = Metric.L2,
      nlist: Int = 16,
      nprobe: Int = 4,
      seed: Long = 42L,
      roundDist: Option[Int] = None,
      reorderK: Int = 50,
      pqM: Int = 8,
      pqKsub: Int = 16,
      version: Int = Capabilities.DefaultVersion,
      // the per-datatype factory key (IndexFactory::Create<fp16>,
      // utils.h:101-104): fp16/bf16 on FLAT build TRUE 2-byte storage
      // (PackedFlatIndex); on other kinds they keep the fp32 compute
      // path over the value grid (operands.h:180-198 mocking)
      elementType: String = "fp32",
      // graph-construction quality knobs for the graph-family arms
      // (NN-descent rounds, RobustPrune alpha — Params.GraphBuildParams);
      // the default reproduces the plain bucketed kNN graph bit-for-bit
      graphBuild: Params.GraphBuildParams = Params.GraphBuildParams()
  ): VectorIndex = {
    require(Capabilities.versionSupported(version),
      s"index version $version outside supported range " +
        s"[${Capabilities.MinVersion}, ${Capabilities.CurrentVersion}] (version.h:23-57)")
    require(Capabilities.IndexTypes.contains(indexType), s"unknown index type $indexType")
    require(Capabilities.supportsMetric(indexType, metric.name),
      s"index $indexType does not support metric ${metric.name}")
    require(Capabilities.supportsDataType(indexType,
        if (indexType.startsWith("BIN_")) "bin1"
        else if (indexType.startsWith("SPARSE_")) "sparse_fp32"
        else elementType),
      s"index $indexType does not support element type $elementType")
    if ((elementType == "fp16" || elementType == "bf16") && indexType == "FLAT")
      return PackedFlatIndex.fromArrays(base, metric, bf16 = elementType == "bf16", roundDist)
    if ((elementType == "fp16" || elementType == "bf16") && indexType == "IVF_FLAT") {
      // convert at Add time (the reference stores fp16 lists): grid-cast
      // the base, assign on grid values, pack the lists to 2-byte BINARY.
      // Coarse centroids stay fp32 arrays (kmeans means of grid values —
      // the reference's coarse quantizer is fp32 over fp16 data too).
      import graft.functions.VectorFunctions.{bf16Storage, fp16Storage, packBf16, packFp16}
      val bf = elementType == "bf16"
      // grid values are exact in fp32, so the float cast is lossless —
      // and the kmeans/assignment path expects ARRAY<FLOAT>
      val baseG = base.select(col("id"),
        (if (bf) bf16Storage(col("vec")) else fp16Storage(col("vec")))
          .cast("array<float>").as("vec"))
      val c = IvfIndex.trainKMeans(spark, baseG, nlist, seed)
      val idx = IvfIndex.build(baseG, c, roundDist)
      val packed = idx.select(col("id"),
        (if (bf) packBf16(col("vec")) else packFp16(col("vec"))).as("vec"), col("cluster_id"))
      return new PackedIvfIndex(packed, c, metric, nprobe, bf, roundDist)
    }
    def cents = IvfIndex.trainKMeans(spark, base, nlist, seed)
    // entry points for graph indexes: one medoid per k-means cluster (the
    // reference enters at the dataset medoid; spreading entries across
    // clusters compensates for the kNN graph's missing long-range edges)
    def clusterMedoids(c: DataFrame): DataFrame = IvfIndex
      .search(c.select(col("cluster_id").as("qid"), col("centroid").as("qvec")),
        IvfIndex.build(base, c, roundDist), c, k = 1, nprobe = 1, Metric.L2, roundDist)
      .select(col("nid")).distinct()
    indexType match {
      case "FLAT" | "BIN_FLAT" => new FlatIndex(base, metric, roundDist)
      case "BIN_IVF_FLAT" =>
        // binary coarse codebook: every count/nlist-th vector of the base
        // (k-means over hamming space degenerates to medoid picking; the
        // reference's binary IVF also clusters in hamming). Assignment,
        // probing and scan pruning are the shared IVF mechanics under the
        // binary metric (ivf.cc:1244-1276 BIN_IVF_FLAT registration).
        val step = math.max(1L, base.count() / nlist)
        val c = base.filter(col("id") % step === 0)
          .select((col("id") / step).cast("long").as("cluster_id"), col("vec").as("centroid"))
        val idx = IvfIndex.build(base, c, roundDist, metric)
        new IvfFlatIndex(idx, c, metric, nprobe, roundDist,
          listSizesMeta = Some(IvfIndex.listSizes(idx)), typeName = indexType)
      case "IVF_FLAT" | "IVF_FLAT_CC" =>
        val c = cents
        val idx = IvfIndex.build(base, c, roundDist)
        new IvfFlatIndex(idx, c, metric, nprobe, roundDist,
          listSizesMeta = Some(IvfIndex.listSizes(idx)), typeName = indexType)
      case "IVF_SQ8" | "IVF_SQ_CC" =>
        val c = cents
        new IvfSq8Index(IvfIndex.build(base, c, roundDist), c,
          Quantization.sq8Train(base), nprobe, reorderK, roundDist, typeName = indexType)
      case "IVF_PQ" | "SCANN" =>
        // SCANN = the same coarse+PQ artifact in its `with_raw_data`
        // configuration — ADC candidates, exact rerank from the raw
        // vectors riding the lists (index_param.h:32)
        val c = cents
        new IvfPqIndex(IvfIndex.build(base, c, roundDist), c,
          ProductQuant.train(spark, base, pqM, pqKsub, seed), nprobe, reorderK, roundDist,
          typeName = indexType)
      case "HNSW" | "HNSW_SQ" | "HNSW_PQ" | "HNSW_PRQ" =>
        // graph: IVF-bucketed candidate construction (no all-pairs pass);
        // quantized variants traverse on reconstructed vectors and
        // exact-rerank the final frontier (faiss_hnsw.cc:2928-2939
        // registrations, refine loop 739-860)
        // degree 8 ≈ the reference's default M band (hnsw_config.h M):
        // degree-5 graphs measured 0.56 recall at nb=500 — under-connected
        val c = cents
        val graph =
          if (graphBuild.isPlain)
            GraphSearch.knnGraphIvf(base, c, degree = 8, nprobe = 2, metric, roundDist)
          else
            GraphSearch.knnGraphDiversified(base, c, degree = 8,
              intermediateDegree = graphBuild.interOr(8), nprobe = 2,
              descentRounds = graphBuild.descentRounds,
              sampleDegree = graphBuild.sampleDegree,
              alpha = graphBuild.alpha, metric = metric, roundDist = roundDist)
        val variant = indexType match {
          case "HNSW" => HnswVariant.Exact
          case "HNSW_SQ" => HnswVariant.Sq8(Quantization.sq8Train(base))
          case "HNSW_PQ" => HnswVariant.Pq(ProductQuant.train(spark, base, pqM, pqKsub, seed))
          case _ =>
            val m1 = ProductQuant.train(spark, base, pqM, pqKsub, seed)
            val m2 = ProductQuant.train(
              spark, ProductQuant.residualFrame(base, m1), pqM, pqKsub, seed + 1000)
            HnswVariant.Prq(m1, m2)
        }
        // 4 hops from the per-cluster medoids — the depth the DISKANN arm
        // uses; 2 hops cannot reach past the entry clusters on a degree-5
        // graph (measured recall 0.2 vs 0.9+ at 4 hops, nb=500)
        new HnswIndex(graph, base, clusterMedoids(c), metric,
          efSearch = reorderK, beamIters = 4, variant, roundDist)
      case "GPU_CAGRA" | "GPU_RAFT_CAGRA" =>
        // CPU-adapt CAGRA (gpu_raft_cagra.cc:38-60): intermediate
        // IVF-bucketed kNN graph → detour-prune + reverse-edge merge down
        // to graph_degree (gpu_raft_cagra_config.h intermediate_graph_
        // degree/graph_degree; defaults scaled to the test corpus the way
        // the HNSW arm scales M) — searched by the batch beam with
        // ef = itopk_size (reorderK here)
        val c = cents
        // interOr(4) keeps the arm's historical default intermediate
        // degree 8 (= 2× graph_degree, the reference's ratio) while
        // honoring an explicit graphBuild.intermediateDegree override
        val graph = Cagra.build(base, c,
          intermediateDegree = graphBuild.interOr(4), graphDegree = 4,
          nprobe = 2, metric, roundDist,
          descentRounds = graphBuild.descentRounds,
          sampleDegree = graphBuild.sampleDegree, alpha = graphBuild.alpha)
        new CagraIndex(graph.select(col("src"), col("dst")), base, clusterMedoids(c),
          metric, itopkSize = reorderK, beamIters = 4, roundDist)
      case "DISKANN" =>
        // search_list_size = reorderK mirrors the reference's
        // search_list_size ≥ k validation (diskann_config.h:172-183).
        // Graph build is the IVF-bucketed candidate construction — the
        // reference also grows Vamana from bounded candidate pools
        // (diskann.cc:348-360), never all pairs.
        val c = cents
        DiskAnn.buildIvf(base, ProductQuant.train(spark, base, pqM, pqKsub, seed),
          clusterMedoids(c), c, degree = 5, nprobe = 2, searchListSize = reorderK,
          beamIters = 4, roundDist = roundDist, graphBuild = graphBuild)
      case s if s.startsWith("SPARSE_") =>
        throw new IllegalArgumentException(
          s"sparse kind $s builds from a documents frame — use IndexFactory.buildSparse")
      case other =>
        throw new IllegalArgumentException(s"index type $other not yet constructible via factory")
    }
  }

  /** Deserialize an HNSW-family index saved by HnswIndex.save. */
  def loadHnsw(
      spark: SparkSession,
      dir: String,
      metric: Metric = Metric.L2,
      efSearch: Int = 16,
      beamIters: Int = 2,
      roundDist: Option[Int] = None,
      loadMode: LoadMode = LoadMode.Mapped
  ): HnswIndex = HnswIndex.load(spark, dir, metric, efSearch, beamIters, roundDist, loadMode)

  /** Deserialize a packed-IVF index saved by PackedIvfIndex.save. */
  def loadIvfPacked(
      spark: SparkSession,
      dir: String,
      metric: Metric = Metric.L2,
      elementType: String = "fp16",
      nprobe: Int = 4,
      roundDist: Option[Int] = None
  ): PackedIvfIndex =
    PackedIvfIndex.load(spark, dir, metric, bf16 = elementType == "bf16", nprobe, roundDist)

  /** Deserialize a packed-FLAT index saved by PackedFlatIndex.save. */
  def loadFlatPacked(
      spark: SparkSession,
      dir: String,
      metric: Metric = Metric.L2,
      elementType: String = "fp16",
      roundDist: Option[Int] = None
  ): PackedFlatIndex =
    PackedFlatIndex.load(spark, dir, metric, bf16 = elementType == "bf16", roundDist)

  /** Deserialize a CAGRA index saved by CagraIndex.save. GPU kinds have
    * no MMAP feature bit, so only [[LoadMode.Resident]]/default apply —
    * the loader mirrors the search-side contract and takes no knob. */
  def loadCagra(
      spark: SparkSession,
      dir: String,
      metric: Metric = Metric.L2,
      itopkSize: Int = 64,
      beamIters: Int = 4,
      roundDist: Option[Int] = None
  ): CagraIndex = CagraIndex.load(spark, dir, metric, itopkSize, beamIters, roundDist)

  /** Deserialize a DiskANN index saved by DiskAnnIndex.save. */
  def loadDiskAnn(
      spark: SparkSession,
      dir: String,
      searchListSize: Int = 16,
      beamIters: Int = 2,
      roundDist: Option[Int] = None
  ): DiskAnnIndex = DiskAnn.load(spark, dir, searchListSize, beamIters, roundDist)

  /** Sparse factory arm: SPARSE_INVERTED_INDEX / SPARSE_WAND build the same
    * artifact (`sparse_index_node.cc:431-470`); the variant selects the
    * query algorithm at search time. */
  def buildSparse(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      k1: Double = 1.2,
      b: Double = 0.75
  ): SparseIndexModel = SparseIndexModel.build(docs, idCol, textCol, k1, b)

  def loadSparse(spark: SparkSession, dir: String): SparseIndexModel =
    SparseIndexModel.load(spark, dir)

  /** Deserialize an IVF index saved by IvfFlatIndex.save.
    * `loadMode` is the `enable_mmap`/`enable_mmap_pop` residency knob
    * ([[LoadMode]]); the lists frame (the big artifact) gets the policy —
    * centroids are broadcast-sized and stay lazy. */
  def loadIvf(
      spark: SparkSession,
      dir: String,
      metric: Metric = Metric.L2,
      nprobe: Int = 4,
      roundDist: Option[Int] = None,
      loadMode: LoadMode = LoadMode.Mapped
  ): IvfFlatIndex = {
    val sizes =
      if (java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/list_sizes")))
        Some(spark.read.parquet(s"$dir/list_sizes"))
      else None
    new IvfFlatIndex(
      LoadMode(spark.read.parquet(s"$dir/lists"), loadMode),
      spark.read.parquet(s"$dir/centroids"),
      metric,
      nprobe,
      roundDist,
      listSizesMeta = sizes)
  }

  /** Deserialize an IVF_SQ8 index saved by IvfSq8Index.save. */
  def loadIvfSq8(
      spark: SparkSession,
      dir: String,
      nprobe: Int = 4,
      reorderK: Int = 50,
      roundDist: Option[Int] = None,
      loadMode: LoadMode = LoadMode.Mapped
  ): IvfSq8Index =
    new IvfSq8Index(
      LoadMode(spark.read.parquet(s"$dir/lists"), loadMode),
      spark.read.parquet(s"$dir/centroids"),
      spark.read.parquet(s"$dir/sq8_stats"),
      nprobe,
      reorderK,
      roundDist)

  /** Deserialize an IVF_PQ index saved by IvfPqIndex.save. */
  def loadIvfPq(
      spark: SparkSession,
      dir: String,
      nprobe: Int = 4,
      reorderK: Int = 50,
      roundDist: Option[Int] = None,
      loadMode: LoadMode = LoadMode.Mapped
  ): IvfPqIndex =
    new IvfPqIndex(
      LoadMode(spark.read.parquet(s"$dir/lists"), loadMode),
      spark.read.parquet(s"$dir/centroids"),
      ProductQuant.loadModel(spark, s"$dir/pq"),
      nprobe,
      reorderK,
      roundDist)
}
