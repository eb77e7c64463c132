package graft

import org.apache.spark.sql.functions._

import graft.operators.{BruteForce, Capabilities, IndexStatics, Metric, Serve}
import graft.sources.Tables

/** Gates for the static V13 `EstimateLoadResource`
  * (`index_static.h:98-140`): each per-family estimate — computed from
  * (count, dim, params) alone, no data touched — must EQUAL the loaded
  * searcher's measured resident-bytes observable. Both sides count array
  * payloads + 8-byte ids and exclude JVM container overhead, so the
  * comparison is exact for deterministic layouts (fixed-degree graphs,
  * explicit centroids). A wrong estimate is an operational failure: with
  * five resident tier layouts live, capacity plans are sized off this. */
class IndexStaticsSpec extends SparkSpec {

  private lazy val base = Tables
    .embeddings(spark, sf0001)
    .select(col("vec_id").as("id"), col("embedding").as("vec"))

  private lazy val entries = Tables
    .embeddings(spark, sf0001)
    .filter(col("vec_id") % 250 === 0)
    .select(col("vec_id").as("nid"))

  private def knnGraph(k: Int) = BruteForce
    .knnFused(
      Tables.embeddings(spark, sf0001)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec")),
      base, k, Metric.L2, roundDist = Some(4), excludeSelf = true)
    .select(col("qid").as("src"), col("nid").as("dst"))

  private lazy val n: Long = base.count()
  private lazy val dim: Int = base.head().getSeq[Float](1).length

  private lazy val ivfCents = Tables.embeddings(spark, sf0001)
    .filter(col("vec_id") % 250 === 0)
    .select(col("vec_id").as("cluster_id"), col("embedding").as("centroid"))

  test("graph vector-tier estimates equal the measured resident bytes (fp32/fp16/int8/SQ8/PQ)") {
    import graft.functions.VectorFunctions.{packFp16, packInt8}
    import graft.operators.{ProductQuant, Quantization}
    val g = knnGraph(5)
    val s32 = Serve.load(g, base, entries, Metric.L2)
    assert(s32.residentVectorBytes == IndexStatics.fp32VectorBytes(n, dim))
    val s16 = Serve.loadPacked(
      g, base.select(col("id"), packFp16(col("vec")).as("vec")), entries, Metric.L2)
    assert(s16.residentVectorBytes == IndexStatics.packedHalfVectorBytes(n, dim))
    val s8 = Serve.loadPackedInt8(
      g, base.select(col("id"), packInt8(col("vec"), 100.0d).as("vec")),
      entries, Metric.L2, 100.0d)
    assert(s8.residentVectorBytes == IndexStatics.packedByteVectorBytes(n, dim))
    val st = Quantization.sq8Train(base)
    val sq = Serve.loadPackedSq8(g, base, entries, Some(st), Metric.L2)
    assert(sq.residentVectorBytes == IndexStatics.packedByteVectorBytes(n, dim))
    val model = ProductQuant.explicitModel(base, m = 8, ksub = 16, step = 25)
    val pq = Serve.loadPackedPq(g, base, entries, model, Metric.L2)
    assert(pq.residentVectorBytes == IndexStatics.pqCodeVectorBytes(n, 8))
  }

  test("IVF estimates equal the measured resident bytes (float, SQ8, PQ, resident-raw add-on)") {
    import graft.operators.{IvfIndex, ProductQuant, Quantization}
    val index = IvfIndex.build(base, ivfCents, Some(4))
    val nlist = ivfCents.count()
    val sF = Serve.loadIvf(index, ivfCents, Metric.L2)
    assert(sF.residentBytes == IndexStatics.ivfFloatBytes(n, dim, nlist))
    val st = Quantization.sq8Train(index.select(col("id"), col("vec")))
    val s8 = Serve.loadIvfSq8(index, ivfCents, Some(st), rawResident = true)
    assert(s8.residentCodeBytes == IndexStatics.ivfCodedBytes(n, dim, nlist, dim))
    val model = ProductQuant.explicitModel(base, m = 8, ksub = 16, step = 25)
    val sP = Serve.loadIvfPq(index, ivfCents, model, rawResident = true)
    assert(sP.residentCodeBytes == IndexStatics.ivfCodedBytes(n, dim, nlist, 8))
    // the with_raw_data add-on (SCANN shape): n·dim fp32s next to the codes
    assert(IndexStatics.residentRawBytes(n, dim) == n * dim.toLong * 4L)
    // facade composes code tier + raw add-on
    assert(Capabilities.estimateLoadResource("IVF_SQ8", n, dim,
      Map("nlist" -> nlist, "with_raw_data" -> 1L)) ==
      IndexStatics.ivfCodedBytes(n, dim, nlist, dim) + IndexStatics.residentRawBytes(n, dim))
  }

  test("binary estimates equal the measured resident bytes (BIN_FLAT, BIN_IVF)") {
    import graft.functions.VectorFunctions.signBits
    import graft.operators.IvfIndex
    val bbin = base.select(col("id"), signBits(col("vec")).as("vec"))
    val sB = Serve.loadBinary(bbin, Metric.Hamming)
    assert(sB.residentBytes == IndexStatics.binaryBytes(n, dim))
    val centsBin = ivfCents.select(col("cluster_id"), signBits(col("centroid")).as("centroid"))
    val idxBin = IvfIndex.build(bbin, centsBin, None, Metric.Hamming)
    val sBI = Serve.loadBinaryIvf(idxBin, centsBin, Metric.Hamming)
    assert(sBI.residentBytes == IndexStatics.binaryIvfBytes(n, dim, centsBin.count()))
  }

  test("DiskANN RAM-tier + warm-cache estimates equal the measured resident bytes") {
    import graft.operators.{DiskAnn, ProductQuant}
    val model = ProductQuant.explicitModel(base, m = 8, ksub = 16, step = 25)
    val idx = DiskAnn.build(base, model, entries.select(col("nid")),
      degree = 5, searchListSize = 16, beamIters = 2, roundDist = Some(4))
    val eCount = entries.count()
    val s = Serve.loadDiskAnn(idx, cacheNodes = 100)
    assert(s.residentBytes ==
      IndexStatics.diskannRamBytes(n, m = 8, degree = 5, entryCount = eCount))
    assert(s.residentCacheBytes == IndexStatics.warmCacheBytes(100L, dim))
    assert(Capabilities.estimateLoadResource("DISKANN", n, dim,
      Map("m" -> 8L, "degree" -> 5L, "entries" -> eCount, "cache_nodes" -> 100L)) ==
      s.residentBytes + s.residentCacheBytes)
  }

  test("facade: per-kind composition, required params loud, unknown kinds refused") {
    // HNSW = entries + fp32 vectors + adjacency
    assert(Capabilities.estimateLoadResource("HNSW", 1000L, 64,
      Map("degree" -> 16L, "entries" -> 4L)) ==
      4L * 8L + IndexStatics.fp32VectorBytes(1000L, 64) + IndexStatics.graphBytes(1000L, 16))
    // quantized graph kinds shrink the vector tier exactly by the code ratio
    val hFp32 = Capabilities.estimateLoadResource("HNSW", 1000L, 64, Map("degree" -> 16L))
    val hSq8 = Capabilities.estimateLoadResource("HNSW_SQ8", 1000L, 64, Map("degree" -> 16L))
    assert(hFp32 - hSq8 == 1000L * 64L * 3L) // 4 B/dim → 1 B/dim
    // missing required param is loud, not a silent guess
    intercept[IllegalArgumentException] {
      Capabilities.estimateLoadResource("IVF_PQ", 1000L, 64, Map("nlist" -> 8L))
    }
    intercept[IllegalArgumentException] {
      Capabilities.estimateLoadResource("NO_SUCH_KIND", 1000L, 64)
    }
  }
}
