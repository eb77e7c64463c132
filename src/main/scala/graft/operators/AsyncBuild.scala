package graft.operators

import scala.concurrent.{ExecutionContext, Future}

import org.apache.spark.sql.SparkSession

/** Async build with cancellation — `BuildAsync` + `Interrupt`
  * (`src/index/index.cc:42-64`, `include/knowhere/index/interrupt.h`):
  * the build runs as a Spark job group; `cancel` maps to
  * `SparkContext.cancelJobGroup`.
  */
object AsyncBuild {

  final case class Handle[T](future: Future[T], jobGroup: String, spark: SparkSession) {
    /** Interrupt: cancel every job launched by the build. */
    def cancel(reason: String = "cancelled"): Unit =
      spark.sparkContext.cancelJobGroup(jobGroup)
  }

  /** Run `body` (a Spark action pipeline) asynchronously under a job group. */
  def run[T](spark: SparkSession, name: String)(body: => T)(
      implicit ec: ExecutionContext): Handle[T] = {
    val group = s"graft-build-$name-${java.util.UUID.randomUUID()}"
    val future = Future {
      spark.sparkContext.setJobGroup(group, s"graft async build: $name", interruptOnCancel = true)
      try body
      finally spark.sparkContext.clearJobGroup()
    }
    Handle(future, group, spark)
  }
}

/** Static facade — `IndexStaticFaced::CreateConfig/ConfigCheck/
  * EstimateLoadResource` (`include/knowhere/index/index_static.h:52-140`):
  * capability and resource answers without building an index.
  */
object IndexStatic {

  /** Estimated in-memory load size in bytes for an index over
    * (count, dim) fp32 vectors — mirrors the reference's per-type resource
    * estimation (vectors + ids + structure overhead). This is the QUICK
    * whole-enum heuristic (every registered kind answers, fixed default
    * degrees, no build params); for capacity planning against the actual
    * serving tiers use [[IndexStatics.estimateLoadResource]], whose
    * param-driven per-family estimates are gated EXACTLY equal to the
    * loaded searchers' measured `resident*Bytes` (IndexStaticsSpec). */
  def estimateLoadResourceBytes(indexType: String, count: Long, dim: Int): Long =
    estimateLoadResourceBytes(indexType, count, dim, "fp32")

  /** Element-type-aware estimate: the packed tiers store what they claim —
    * fp16/bf16 = 2 bytes/element, int8 = 1 (operands.h:48-147), so a
    * packed FLAT/IVF_FLAT estimate is half (quarter) the fp32 bytes. */
  def estimateLoadResourceBytes(
      indexType: String, count: Long, dim: Int, elementType: String): Long = {
    val bytesPerElem = elementType match {
      case "fp32" => 4L
      case "fp16" | "bf16" => 2L
      case "int8" => 1L
      case other => throw new IllegalArgumentException(s"unknown element type $other")
    }
    val vecBytes = count * dim * bytesPerElem
    val idBytes = count * 8L
    indexType match {
      case "FLAT" => vecBytes + idBytes
      case "BIN_FLAT" => count * ((dim + 7) / 8).toLong + idBytes
      case "IVF_FLAT" | "IVF_FLAT_CC" =>
        vecBytes + idBytes + (vecBytes / 10) // lists + centroids overhead
      case "BIN_IVF_FLAT" =>
        count * ((dim + 7) / 8).toLong + idBytes + (idBytes / 10)
      case "IVF_SQ8" | "IVF_SQ_CC" => count * dim.toLong + idBytes // 1 byte/dim codes
      // PQ codes (m=8 subspaces, 1 byte each) + raw vectors riding the
      // lists (with_raw_data rerank tier)
      case "IVF_PQ" | "SCANN" => count * 8L + vecBytes + idBytes
      // graph: degree-8 adjacency (two longs per edge relationally);
      // quantized variants add their code tier on top of raw (refine-flat)
      case "HNSW" => vecBytes + idBytes + count * 8L * 16
      case "HNSW_SQ" => vecBytes + idBytes + count * 8L * 16 + count * dim.toLong
      case "HNSW_PQ" => vecBytes + idBytes + count * 8L * 16 + count * 8L
      case "HNSW_PRQ" => vecBytes + idBytes + count * 8L * 16 + count * 16L
      // memory tier only: PQ codes steer the beam; raw stays on SSD
      // (pq_code_budget_gb's role, diskann_config.h:26-143)
      case "DISKANN" => count * 8L + idBytes
      // CPU-adapt CAGRA: raw vectors (the answer tier) + the optimized
      // fixed-degree graph (graph_degree=4 edges × two longs relationally)
      case "GPU_CAGRA" | "GPU_RAFT_CAGRA" => vecBytes + idBytes + count * 8L * 8
      case "SPARSE_INVERTED_INDEX" | "SPARSE_INVERTED_INDEX_CC" |
          "SPARSE_WAND" | "SPARSE_WAND_CC" => count * 12L * 32 // ~32 nnz × (idx,val)
      case other => throw new IllegalArgumentException(s"unknown index type $other")
    }
  }

  /** ConfigCheck without an instance (V13): validate search params for an
    * index type. */
  def configCheck(indexType: String, params: Params.KnnParams): Boolean = {
    params.validated
    Capabilities.supportsMetric(indexType, params.metric)
  }
}
