package graft

import org.apache.spark.sql.functions._

import graft.operators._
import graft.sources.Tables

/** Verb telemetry (`src/index/index.cc:130-160` TimeRecorder + latency
  * histograms; `prometheus_client.cc:16-18` bucket bounds): the decorator
  * records every verb, histograms are cumulative and consistent, and the
  * decorated index returns untouched results.
  */
class TelemetrySpec extends SparkSpec {

  private lazy val base = Tables
    .embeddings(spark, sf0001)
    .select(col("vec_id").as("id"), col("embedding").as("vec"))

  private lazy val queries = Tables
    .embeddings(spark, sf0001)
    .filter(col("vec_id") % 100 === 0)
    .select(col("vec_id").as("qid"), col("embedding").as("qvec"))

  test("decorated verbs land in the registry with the right keys") {
    Telemetry.reset()
    val idx = new TimedIndex(new FlatIndex(base, Metric.L2, Some(4)))
    idx.search(queries, 5, None).count()
    idx.search(queries, 5, None).count()
    idx.rangeSearch(queries, 1.5, 0.0, None).count()
    idx.getVectorByIds(queries.select(col("qid").as("id"))).count()
    val s = Telemetry.summary(spark).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(s(("FLAT", "search")) == 2L)
    assert(s(("FLAT", "range_search")) == 1L)
    assert(s(("FLAT", "get_vector_by_ids")) == 1L)
  }

  test("results pass through the decorator untouched") {
    val plain = new FlatIndex(base, Metric.L2, Some(4))
    val timed = new TimedIndex(new FlatIndex(base, Metric.L2, Some(4)))
    assert(timed.search(queries, 5, None).collect().toSet
      == plain.search(queries, 5, None).collect().toSet)
    assert(timed.indexType == "FLAT")
  }

  test("histogram is cumulative, ends at +Inf with the total count") {
    Telemetry.reset()
    val idx = new TimedIndex(new FlatIndex(base, Metric.L2, Some(4)))
    (1 to 3).foreach(_ => idx.search(queries, 5, None).count())
    val h = Telemetry.histogram(spark)
      .filter(col("verb") === "search")
      .orderBy(col("le_ms"))
      .collect()
    assert(h.length == Telemetry.BucketBoundsMs.length + 1)
    // cumulative counts never decrease; the +Inf tail equals total
    val cums = h.map(_.getLong(3))
    assert(cums.zip(cums.tail).forall { case (a, b) => a <= b })
    assert(h.last.getLong(2) == Long.MaxValue)
    assert(h.last.getLong(3) == 3L)
  }

  test("bucket bounds mirror prometheus_client.cc defaultBuckets") {
    assert(Telemetry.BucketBoundsMs.head == 1L)
    assert(Telemetry.BucketBoundsMs.last == 1048576L)
    assert(Telemetry.BucketBoundsMs.length == 21)
    assert(Telemetry.BucketBoundsMs.zip(Telemetry.BucketBoundsMs.tail)
      .forall { case (a, b) => b == 2 * a })
  }
}
