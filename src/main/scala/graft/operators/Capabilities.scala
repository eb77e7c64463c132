package graft.operators

/** Static capability surface — the reference's index↔metric/datatype tables
  * and feature bits (`include/knowhere/comp/knowhere_check.h:22-41`,
  * `feature.h:21-56`, `index_factory.cc:118-128`) plus the per-index
  * `HasRawData` probe (`index_node.h:349-350`).
  */
object Capabilities {

  /** Every CPU index kind the reference registers (`index_param.h:21-62`
    * IndexEnum, minus the GPU families — ARCHITECTURE.md §5): the faiss
    * flat/IVF kinds, their concurrent (CC) growing-segment variants, SCANN,
    * the HNSW family, DISKANN, and the sparse kinds. */
  val IndexTypes: Set[String] =
    Set("FLAT", "BIN_FLAT", "IVF_FLAT", "IVF_FLAT_CC", "BIN_IVF_FLAT",
      "IVF_SQ8", "IVF_SQ_CC", "IVF_PQ", "SCANN",
      "HNSW", "HNSW_SQ", "HNSW_PQ", "HNSW_PRQ", "DISKANN",
      // CAGRA rides the CPU-adapt path (gpu_raft_cagra.cc:38-60
      // adapt_for_cpu: GPU-trained, CPU-searched) — the one GPU kind with
      // a registered CPU serving contract; the pure-GPU families remain
      // out of scope (ARCHITECTURE.md §5)
      "GPU_CAGRA", "GPU_RAFT_CAGRA",
      "SPARSE_INVERTED_INDEX", "SPARSE_INVERTED_INDEX_CC",
      "SPARSE_WAND", "SPARSE_WAND_CC")

  private val metricTable: Map[String, Set[String]] = Map(
    "FLAT" -> Set("l2", "l2sq", "ip", "cosine"),
    "BIN_FLAT" -> Set("hamming", "jaccard"),
    "IVF_FLAT" -> Set("l2", "l2sq", "ip", "cosine"),
    "IVF_FLAT_CC" -> Set("l2", "l2sq", "ip", "cosine"),
    "BIN_IVF_FLAT" -> Set("hamming", "jaccard"),
    "IVF_SQ8" -> Set("l2", "l2sq"),
    "IVF_SQ_CC" -> Set("l2", "l2sq"),
    "IVF_PQ" -> Set("l2", "l2sq"),
    "SCANN" -> Set("l2", "l2sq"),
    "HNSW" -> Set("l2", "l2sq", "ip", "cosine"),
    "HNSW_SQ" -> Set("l2", "l2sq", "ip", "cosine"),
    "HNSW_PQ" -> Set("l2", "l2sq", "ip", "cosine"),
    "HNSW_PRQ" -> Set("l2", "l2sq", "ip", "cosine"),
    "DISKANN" -> Set("l2", "l2sq"),
    // CheckAndAdjust legal_metric_list [L2 IP COSINE]
    // (gpu_raft_cagra_config.h:130-137)
    "GPU_CAGRA" -> Set("l2", "l2sq", "ip", "cosine"),
    "GPU_RAFT_CAGRA" -> Set("l2", "l2sq", "ip", "cosine"),
    "SPARSE_INVERTED_INDEX" -> Set("ip", "bm25"),
    "SPARSE_INVERTED_INDEX_CC" -> Set("ip", "bm25"),
    "SPARSE_WAND" -> Set("ip", "bm25"),
    "SPARSE_WAND_CC" -> Set("ip", "bm25")
  )

  def supportsMetric(indexType: String, metric: String): Boolean =
    metricTable.getOrElse(indexType, Set.empty).contains(metric.toLowerCase)

  /** Element-type table (`VecType`, index_param.h:196-203; per-datatype
    * factory keys, utils.h:95-110). fp16/bf16/int8 ride the fp32 compute
    * path via storage casts (operands.h:180-198 mocking). */
  private val dataTypeTable: Map[String, Set[String]] = Map(
    "FLAT" -> Set("fp32", "fp16", "bf16", "int8"),
    "BIN_FLAT" -> Set("bin1"),
    "IVF_FLAT" -> Set("fp32", "fp16", "bf16", "int8"),
    "IVF_FLAT_CC" -> Set("fp32", "fp16", "bf16", "int8"),
    "BIN_IVF_FLAT" -> Set("bin1"),
    "IVF_SQ8" -> Set("fp32", "fp16", "bf16"),
    "IVF_SQ_CC" -> Set("fp32", "fp16", "bf16"),
    "IVF_PQ" -> Set("fp32", "fp16", "bf16"),
    "SCANN" -> Set("fp32", "fp16", "bf16"),
    "HNSW" -> Set("fp32", "fp16", "bf16"),
    "HNSW_SQ" -> Set("fp32", "fp16", "bf16"),
    "HNSW_PQ" -> Set("fp32", "fp16", "bf16"),
    "HNSW_PRQ" -> Set("fp32", "fp16", "bf16"),
    // "DiskANN only support floating point data type(float32, float16,
    // bfloat16)" — diskann.cc:36-37
    "DISKANN" -> Set("fp32", "fp16", "bf16"),
    // fp32-only registration (gpu_raft_cagra.cc:163-175)
    "GPU_CAGRA" -> Set("fp32"),
    "GPU_RAFT_CAGRA" -> Set("fp32"),
    "SPARSE_INVERTED_INDEX" -> Set("sparse_fp32"),
    "SPARSE_INVERTED_INDEX_CC" -> Set("sparse_fp32"),
    "SPARSE_WAND" -> Set("sparse_fp32"),
    "SPARSE_WAND_CC" -> Set("sparse_fp32")
  )

  def supportsDataType(indexType: String, dataType: String): Boolean =
    dataTypeTable.getOrElse(indexType, Set.empty).contains(dataType.toLowerCase)

  /** Raw vectors retained? FLAT/IVF_FLAT keep them (GetVectorByIds works).
    * Our IVF_SQ8/IVF_PQ are the reference's SCANN-style `with_raw_data`
    * variants — raw vectors ride alongside the codes to power the exact
    * rerank and range search, so GetVectorByIds works there too (the
    * reference's codes-only IVF_SQ8 answers false, `flat.cc:258-283`; its
    * SCANN answers `with_raw_data`). */
  def hasRawData(indexType: String): Boolean = indexType match {
    case "FLAT" | "BIN_FLAT" | "IVF_FLAT" | "IVF_FLAT_CC" | "BIN_IVF_FLAT" => true
    case "IVF_SQ8" | "IVF_SQ_CC" | "IVF_PQ" | "SCANN" => true
    // HNSW family: raw vectors are the refine tier (faiss_hnsw.cc refine
    // loop 739-860); our rendering always retains them, so GetVectorByIds
    // works on every variant — the reference's refine-flat configuration
    case "HNSW" | "HNSW_SQ" | "HNSW_PQ" | "HNSW_PRQ" => true
    // DiskANN keeps full-precision vectors on SSD (diskann.cc GetVectorByIds)
    case "DISKANN" => true
    // GPU kinds report false even when the device caches the dataset
    // (gpu_raft.h:152-154) — mirrored here although the Spark handle
    // retains its parquet base (same shape as the reference's CPU-adapt
    // node, which holds the data yet keeps the contract bit false)
    case "GPU_CAGRA" | "GPU_RAFT_CAGRA" => false
    case _ => false
  }

  /** Metric-dependent probe: the sparse in-memory index retains raw rows
    * only under IP — BM25 stores transformed values
    * (`sparse_index_node.cc:541-543` `IsMetricType(metric, IP)`). */
  def hasRawData(indexType: String, metric: String): Boolean = indexType match {
    case "SPARSE_INVERTED_INDEX" | "SPARSE_INVERTED_INDEX_CC" |
        "SPARSE_WAND" | "SPARSE_WAND_CC" => metric.toLowerCase == "ip"
    case t => hasRawData(t)
  }

  /** Concurrent-append (CC) support — the streaming growing-segment path
    * (IVF_FLAT_CC, SPARSE_INVERTED_INDEX_CC and SPARSE_WAND_CC
    * registrations, `index_param.h:30-61`,
    * `sparse_index_node.cc:591-595`). */
  def supportsConcurrentAppend(indexType: String): Boolean =
    indexType match {
      case "IVF_FLAT" | "FLAT" | "SPARSE_INVERTED_INDEX" | "SPARSE_WAND" => true
      case "IVF_FLAT_CC" | "IVF_SQ_CC" |
          "SPARSE_INVERTED_INDEX_CC" | "SPARSE_WAND_CC" => true
      case _ => false
    }

  /** mmap feature bit (`feature.h:40-46` `MMAP`, config knobs
    * `enable_mmap`/`enable_mmap_pop` `config.h:604-605`): whether the
    * index's serialized artifact can be served memory-mapped instead of
    * fully resident. The Spark rendering: every in-memory index kind maps
    * (its parquet tables load under any storage level, incl. DISK_ONLY —
    * the mmap analog, ARCHITECTURE.md §1); DISKANN is the disk-NATIVE
    * layout (the reference registers it with the DISK feature, not MMAP —
    * its raw tier already lives on SSD). */
  def supportsMmap(indexType: String): Boolean = indexType match {
    case "DISKANN" => false
    // device-resident artifact — the reference registers the GPU kinds
    // without the MMAP feature bit (feature.h:40-46)
    case "GPU_CAGRA" | "GPU_RAFT_CAGRA" => false
    case t => IndexTypes.contains(t)
  }

  /** Additional-scalar (materialized-view) support bit
    * (`index_node.h` IsAdditionalScalarSupported, default false;
    * `src/index/hnsw/faiss_hnsw.cc` overrides to true when the view is
    * mv-ONLY): whether the index can serve a search whose filter is
    * fully answered by an attached scalar view. Only the HNSW family
    * registers the override in the reference. */
  def supportsAdditionalScalar(indexType: String, isMvOnly: Boolean): Boolean =
    indexType match {
      case "HNSW" | "HNSW_SQ" | "HNSW_PQ" | "HNSW_PRQ" => isMvOnly
      case _ => false
    }

  /** Static V13 `EstimateLoadResource` (`index_static.h:98-140`):
    * predicted resident bytes of loading an index for serving, from
    * (type, count, dim, params) alone — no load. Delegates to
    * [[IndexStatics.estimateLoadResource]]; IndexStaticsSpec gates the
    * estimates against every loaded searcher's measured observables. */
  def estimateLoadResource(
      indexType: String,
      count: Long,
      dim: Int,
      params: Map[String, Long] = Map.empty): Long =
    IndexStatics.estimateLoadResource(indexType, count, dim, params)

  /** Index-version gating (`include/knowhere/version.h:23-57`: versions
    * 0..6 with `VersionSupport`/min/current/default): factories accept a
    * version and refuse out-of-range ones. All kinds in [[IndexTypes]]
    * exist across the supported range. */
  val MinVersion = 0
  val CurrentVersion = 6
  val DefaultVersion: Int = CurrentVersion
  def versionSupported(version: Int): Boolean =
    version >= MinVersion && version <= CurrentVersion
}
