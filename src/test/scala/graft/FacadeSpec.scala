package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.{BruteForce, Metric}
import graft.sources.Tables

/** V12 factory + V16 Index handle semantics. */
class FacadeSpec extends SparkSpec {

  private lazy val base = Tables
    .embeddings(spark, sf0001)
    .select(col("vec_id").as("id"), col("embedding").as("vec"))

  private lazy val queries = Tables
    .embeddings(spark, sf0001)
    .filter(col("vec_id") % 100 === 0)
    .select(col("vec_id").as("qid"), col("embedding").as("qvec"))

  test("FLAT via factory equals direct brute force; meta verbs work") {
    val idx = IndexFactory.build(spark, "FLAT", base, Metric.L2)
    assert(idx.hasRawData)
    assert(idx.count == 500L)
    assert(idx.dim == 64)
    val a = idx.search(queries, 5).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = BruteForce.knn(queries, base, 5, Metric.L2).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b)
  }

  test("IVF_FLAT save/load round-trip preserves search results") {
    val idx = IndexFactory
      .build(spark, "IVF_FLAT", base, Metric.L2, nlist = 4, nprobe = 2, roundDist = Some(4))
      .asInstanceOf[IvfFlatIndex]
    val dir = Files.createTempDirectory("graft-facade").toString
    idx.save(dir)
    val loaded = IndexFactory.loadIvf(spark, dir, Metric.L2, nprobe = 2, roundDist = Some(4))
    val a = idx.search(queries, 5, None).collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val b = loaded.search(queries, 5, None).collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(a == b)
  }

  test("factory rejects unsupported metric/index combinations") {
    assertThrows[IllegalArgumentException](
      IndexFactory.build(spark, "BIN_FLAT", base, Metric.L2))
    assertThrows[IllegalArgumentException](
      IndexFactory.build(spark, "NOT_AN_INDEX", base, Metric.L2))
  }
}
