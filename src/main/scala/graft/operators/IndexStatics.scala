package graft.operators

/** Static `EstimateLoadResource` (V13) — the reference answers "how much
  * RAM will loading this index take" WITHOUT loading it
  * (`include/knowhere/index/index_static.h:98-140`: a per-index-type
  * static method computing the estimate from row count / dim / build
  * params alone; deployments size serving nodes off it before any bytes
  * move). The Spark rendering mirrors that contract for every serving
  * tier layout in [[Serve]]: each component function below models
  * PRECISELY what the loaded searcher's `resident*Bytes` observable
  * measures (array payloads + 8-byte ids — JVM container overhead is
  * excluded on both sides, so estimate and measurement are comparable),
  * and the [[estimateLoadResource]] facade composes them per index kind.
  * IndexStaticsSpec gates |estimate − measured| = 0 for deterministic
  * layouts and a tight relative tolerance where a count depends on data
  * (per-list membership, graph degree spread).
  *
  * Relationship to [[IndexStatic.estimateLoadResourceBytes]]: that older
  * facade is the quick whole-enum heuristic (answers for every registered
  * kind, fixed default degrees, element-type-scaled); THIS object is the
  * param-driven serving-tier estimator whose numbers are asserted equal
  * to the measured residency — use it when the answer sizes a deployment.
  */
object IndexStatics {

  /** fp32 vector tier: what `LocalGraphSearcher.residentVectorBytes`
    * measures on a float load (vectors only; ids/adjacency separate). */
  def fp32VectorBytes(count: Long, dim: Int): Long = count * dim.toLong * 4L

  /** 2-byte packed (fp16/bf16) tier — `loadPacked`'s packed buffers. */
  def packedHalfVectorBytes(count: Long, dim: Int): Long = count * dim.toLong * 2L

  /** 1-byte packed tiers — int8 (`loadPackedInt8`) and SQ8 codes
    * (`loadPackedSq8`): one byte per dim either way. */
  def packedByteVectorBytes(count: Long, dim: Int): Long = count * dim.toLong

  /** PQ code tier — m bytes per vector (`loadPackedPq`, and the code
    * payload of `loadIvfPq`'s lists). */
  def pqCodeVectorBytes(count: Long, m: Int): Long = count * m.toLong

  /** Graph adjacency: per node one 8-byte key + degree 8-byte neighbor
    * ids. `degree` is the build parameter (exact for the repo's fixed-
    * degree builds; an upper bound when pruning trims edges). */
  def graphBytes(count: Long, degree: Long): Long =
    count * (8L + degree * 8L)

  /** Coarse quantizer: nlist centroids, each an 8-byte id + dim fp32s —
    * the `cents` component of every IVF searcher. */
  def centroidBytes(nlist: Long, dim: Int): Long = nlist * (8L + dim.toLong * 4L)

  /** Coded IVF tier (`LocalIvfCodedSearcher.residentCodeBytes`): per-list
    * ids + per-vector codes + the coarse quantizer. `codeBytes` is dim
    * for SQ8, m for PQ. */
  def ivfCodedBytes(count: Long, dim: Int, nlist: Long, codeBytes: Int): Long =
    count * (8L + codeBytes.toLong) + centroidBytes(nlist, dim)

  /** Float IVF tier (`loadIvf` resident lists): ids + fp32 vectors +
    * the coarse quantizer. */
  def ivfFloatBytes(count: Long, dim: Int, nlist: Long): Long =
    count * (8L + dim.toLong * 4L) + centroidBytes(nlist, dim)

  /** Resident raw tier (`ResidentRawTier.residentFloats` × 4 — the SCANN
    * `with_raw_data` add-on a `rawResident = true` load pays). */
  def residentRawBytes(count: Long, dim: Int): Long = count * dim.toLong * 4L

  /** Packed binary tier (`LocalBinarySearcher.residentBytes`): 8-byte id
    * + ceil(dim/32) 8-byte signature words per vector (the `signBits`
    * layout packs 32 dims per long). */
  def binaryBytes(count: Long, dim: Int): Long = {
    val words = (dim.toLong + 31L) / 32L
    count * (8L + words * 8L)
  }

  /** Binary IVF: packed lists (ids + signatures) + packed centroids. */
  def binaryIvfBytes(count: Long, dim: Int, nlist: Long): Long = {
    val words = (dim.toLong + 31L) / 32L
    count * (8L + words * 8L) + nlist * (8L + words * 8L)
  }

  /** DiskANN RAM tier (`LocalDiskAnnSearcher.residentBytes`): entry ids +
    * (id + m-byte code) per node + adjacency — raw vectors are NOT here
    * (they page from the sector store; the `pq_code_budget_gb` model). */
  def diskannRamBytes(count: Long, m: Int, degree: Long, entryCount: Long): Long =
    entryCount * 8L + count * (8L + m.toLong) + graphBytes(count, degree)

  /** Warm-node cache (`search_cache_budget_gb` analog,
    * `LocalDiskAnnSearcher.residentCacheBytes`): id + fp32 vector per
    * cached node. */
  def warmCacheBytes(cacheNodes: Long, dim: Int): Long =
    cacheNodes * (8L + dim.toLong * 4L)

  /** The V13 facade: predicted resident bytes of loading `indexType` for
    * serving, from static shape alone. `params` carries the family's
    * build knobs under the reference's own param names — `degree`
    * (graph/DiskANN edge count per node), `nlist` (IVF lists), `m` (PQ
    * subspaces), `entries` (graph/DiskANN entry points), `cache_nodes`
    * (DiskANN warm cache), `with_raw_data` (1 = resident raw add-on).
    * Unknown kinds throw — an estimate that silently guessed would be
    * worse than none (capacity planning is the one consumer). */
  def estimateLoadResource(
      indexType: String,
      count: Long,
      dim: Int,
      params: Map[String, Long] = Map.empty): Long = {
    def p(key: String, default: Long = -1L): Long =
      params.getOrElse(key, {
        require(default >= 0L, s"estimateLoadResource($indexType) needs param '$key'")
        default
      })
    val entries = p("entries", 1L)
    val rawAddOn =
      if (p("with_raw_data", 0L) == 1L) residentRawBytes(count, dim) else 0L
    indexType.toUpperCase match {
      case "FLAT" | "BRUTEFORCE" =>
        count * 8L + fp32VectorBytes(count, dim)
      case "HNSW" | "GRAPH" =>
        entries * 8L + fp32VectorBytes(count, dim) + graphBytes(count, p("degree"))
      case "HNSW_FP16" | "HNSW_BF16" =>
        entries * 8L + packedHalfVectorBytes(count, dim) + graphBytes(count, p("degree"))
      case "HNSW_INT8" =>
        entries * 8L + packedByteVectorBytes(count, dim) + graphBytes(count, p("degree"))
      case "HNSW_SQ" | "HNSW_SQ8" =>
        entries * 8L + packedByteVectorBytes(count, dim) +
          graphBytes(count, p("degree")) + rawAddOn
      case "HNSW_PQ" =>
        entries * 8L + pqCodeVectorBytes(count, p("m").toInt) +
          graphBytes(count, p("degree")) + rawAddOn
      case "IVF_FLAT" | "IVFFLAT" =>
        ivfFloatBytes(count, dim, p("nlist"))
      case "IVF_SQ8" =>
        ivfCodedBytes(count, dim, p("nlist"), dim) + rawAddOn
      case "IVF_PQ" =>
        ivfCodedBytes(count, dim, p("nlist"), p("m").toInt) + rawAddOn
      case "BIN_FLAT" =>
        binaryBytes(count, dim)
      case "BIN_IVF" | "BIN_IVF_FLAT" =>
        binaryIvfBytes(count, dim, p("nlist"))
      case "DISKANN" =>
        diskannRamBytes(count, p("m").toInt, p("degree"), entries) +
          warmCacheBytes(p("cache_nodes", 0L), dim)
      case other =>
        throw new IllegalArgumentException(
          s"estimateLoadResource: unknown index type '$other'")
    }
  }
}
