package graft

import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.operators._
import graft.sources.Tables

/** LoadMode — the `enable_mmap` / `enable_mmap_pop` residency knob
  * (`include/knowhere/config.h:604-605,684-694`;
  * `sparse_index_node.cc:308-313` MAP_POPULATE): loaded frames end up at
  * the advertised storage level and search results are mode-invariant.
  */
class LoadModeSpec extends SparkSpec {

  private lazy val base = Tables
    .embeddings(spark, sf0001)
    .select(col("vec_id").as("id"), col("embedding").as("vec"))

  private lazy val queries = Tables
    .embeddings(spark, sf0001)
    .filter(col("vec_id") % 100 === 0)
    .select(col("vec_id").as("qid"), col("embedding").as("qvec"))

  private lazy val savedDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("loadmode").toString
    IndexFactory.build(spark, "IVF_FLAT", base, Metric.L2,
      nlist = 8, nprobe = 8, roundDist = Some(4))
      .save(dir)
    dir
  }

  test("Mapped (enable_mmap): loaded lists stay lazy — no storage level") {
    val idx = IndexFactory.loadIvf(spark, savedDir, Metric.L2, nprobe = 8,
      roundDist = Some(4), loadMode = LoadMode.Mapped)
    assert(idx.index.storageLevel == StorageLevel.NONE)
  }

  test("Resident (enable_mmap=false): lists persisted MEMORY_AND_DISK") {
    val idx = IndexFactory.loadIvf(spark, savedDir, Metric.L2, nprobe = 8,
      roundDist = Some(4), loadMode = LoadMode.Resident)
    assert(idx.index.storageLevel == StorageLevel.MEMORY_AND_DISK)
    idx.index.unpersist()
  }

  test("MappedPopulated (enable_mmap_pop): lists prefaulted DISK_ONLY") {
    val idx = IndexFactory.loadIvf(spark, savedDir, Metric.L2, nprobe = 8,
      roundDist = Some(4), loadMode = LoadMode.MappedPopulated)
    assert(idx.index.storageLevel == StorageLevel.DISK_ONLY)
    idx.index.unpersist()
  }

  test("search results are residency-invariant") {
    val results = Seq(LoadMode.Mapped, LoadMode.Resident, LoadMode.MappedPopulated)
      .map { mode =>
        val idx = IndexFactory.loadIvf(spark, savedDir, Metric.L2, nprobe = 8,
          roundDist = Some(4), loadMode = mode)
        val r = idx.search(queries, 10, None).collect().toSet
        idx.index.unpersist()
        r
      }
    assert(results.distinct.size == 1)
  }

  test("HNSW loader takes the knob on graph and raw tiers") {
    val dir = java.nio.file.Files.createTempDirectory("loadmode_hnsw").toString
    IndexFactory.build(spark, "HNSW", base, Metric.L2,
      nlist = 8, roundDist = Some(4), reorderK = 16)
      .save(dir)
    val idx = IndexFactory.loadHnsw(spark, dir, Metric.L2, efSearch = 16,
      beamIters = 2, roundDist = Some(4), loadMode = LoadMode.MappedPopulated)
    assert(idx.graph.storageLevel == StorageLevel.DISK_ONLY)
    assert(idx.base.storageLevel == StorageLevel.DISK_ONLY)
    idx.graph.unpersist()
    idx.base.unpersist()
  }
}
