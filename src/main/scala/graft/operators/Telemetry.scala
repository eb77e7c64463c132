package graft.operators

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.{AtomicLong, AtomicLongArray}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}

import graft.VectorIndex

/** Per-verb latency observability — the reference wraps every index verb
  * with a span + latency histogram (`src/index/index.cc:130-160`
  * TimeRecorder → `knowhere_search_latency.Observe`;
  * `src/common/prometheus_client.cc:16-18` power-of-two ms buckets,
  * `src/common/tracer.cc` OTel spans).
  *
  * Spark rendering: verbs here are driver-coordinated Spark jobs, so the
  * driver is the one place a verb's wall-clock exists — a JVM-local
  * registry of (index_type, verb) → {count, sum, max, power-of-two-ms
  * histogram} with the reference's `defaultBuckets` boundaries. Cluster
  * internals (per-task time, shuffle bytes) stay with Spark's own
  * metrics system (ARCHITECTURE.md §5); this covers the verb-level
  * histograms that had no analog.
  *
  * Latency is nondeterministic, so the surface is ScalaTest-gated
  * (TelemetrySpec), not oracle-gated.
  */
object Telemetry {

  /** prometheus_client.cc:16-18 defaultBuckets (upper bounds, ms). */
  val BucketBoundsMs: Array[Long] =
    Array(1L, 2L, 4L, 8L, 16L, 32L, 64L, 128L, 256L, 512L, 1024L, 2048L,
      4096L, 8192L, 16384L, 32768L, 65536L, 131072L, 262144L, 524288L, 1048576L)

  private final class Stat {
    val count = new AtomicLong(0L)
    val sumMs = new AtomicLong(0L)
    val maxMs = new AtomicLong(0L)
    val buckets = new AtomicLongArray(BucketBoundsMs.length + 1) // +inf tail

    def observe(ms: Long): Unit = {
      count.incrementAndGet()
      sumMs.addAndGet(ms)
      var m = maxMs.get()
      while (ms > m && !maxMs.compareAndSet(m, ms)) m = maxMs.get()
      var i = 0
      while (i < BucketBoundsMs.length && ms > BucketBoundsMs(i)) i += 1
      buckets.incrementAndGet(i)
    }
  }

  private val registry = new ConcurrentHashMap[(String, String), Stat]()

  private[operators] def observe(indexType: String, verb: String, ms: Long): Unit =
    registry.computeIfAbsent((indexType, verb), _ => new Stat).observe(ms)

  /** Time one verb invocation into the registry. */
  def timed[T](indexType: String, verb: String)(body: => T): T = {
    val t0 = System.nanoTime()
    try body
    finally observe(indexType, verb, (System.nanoTime() - t0) / 1000000L)
  }

  def reset(): Unit = registry.clear()

  /** Summary frame: one row per (index_type, verb) —
    * (index_type, verb, count, sum_ms, max_ms). */
  def summary(spark: SparkSession): DataFrame = {
    import spark.implicits._
    import scala.jdk.CollectionConverters._
    registry.asScala.toSeq
      .map { case ((t, v), s) => (t, v, s.count.get(), s.sumMs.get(), s.maxMs.get()) }
      .sortBy(r => (r._1, r._2))
      .toDF("index_type", "verb", "count", "sum_ms", "max_ms")
  }

  /** Histogram frame in Prometheus cumulative form: one row per
    * (index_type, verb, le_ms) with the cumulative count ≤ bound;
    * le_ms = Long.MaxValue is the +Inf bucket. */
  def histogram(spark: SparkSession): DataFrame = {
    import spark.implicits._
    import scala.jdk.CollectionConverters._
    val rows = registry.asScala.toSeq.flatMap { case ((t, v), s) =>
      var cum = 0L
      (0 to BucketBoundsMs.length).map { i =>
        cum += s.buckets.get(i)
        val le = if (i < BucketBoundsMs.length) BucketBoundsMs(i) else Long.MaxValue
        (t, v, le, cum)
      }
    }
    rows.sortBy(r => (r._1, r._2, r._3)).toDF("index_type", "verb", "le_ms", "cumulative")
  }
}

/** Decorator adding verb telemetry to any [[VectorIndex]] — the analog of
  * the reference's `Index<T>` facade, which owns the TimeRecorder +
  * histogram around each node call (`index.cc:130-160`). Results pass
  * through untouched. */
final class TimedIndex(inner: VectorIndex) extends VectorIndex {
  override def indexType: String = inner.indexType
  override def count: Long = Telemetry.timed(indexType, "count")(inner.count)
  override def dim: Int = Telemetry.timed(indexType, "dim")(inner.dim)
  override def search(queries: DataFrame, k: Int, filter: Option[Column]): DataFrame =
    Telemetry.timed(indexType, "search")(inner.search(queries, k, filter))
  override def rangeSearch(queries: DataFrame, radius: Double, rangeFilter: Double,
      filter: Option[Column]): DataFrame =
    Telemetry.timed(indexType, "range_search")(
      inner.rangeSearch(queries, radius, rangeFilter, filter))
  override def getVectorByIds(ids: DataFrame): DataFrame =
    Telemetry.timed(indexType, "get_vector_by_ids")(inner.getVectorByIds(ids))
  override def save(dir: String): Unit =
    Telemetry.timed(indexType, "serialize")(inner.save(dir))
  override def indexMetaJson: String = inner.indexMetaJson
}
