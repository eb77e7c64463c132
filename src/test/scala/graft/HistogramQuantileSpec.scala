package graft

import org.apache.spark.sql.functions._

import graft.plans.HistogramQuantileAgg.histQuantiles
import graft.plans.HistogramBuffer

/** The mergeable histogram-quantile sketch: hand-checked read-offs,
  * clamping, and the partition-order invariance that lets the estimate sit
  * under the exact hash gate. */
class HistogramQuantileSpec extends SparkSpec {
  import spark.implicits._

  test("hand-checked percentiles on 0..99") {
    val df = (0 until 100).map(_.toDouble).toDF("v")
    val r = df.agg(histQuantiles(col("v")).as("q"))
      .select(col("q.p50"), col("q.p95"), col("q.p99")).head()
    // smallest value whose rank reaches p% of 100: the 50th value (=49),
    // the 95th (=94), the 99th (=98); integer values sit on bucket edges
    assert((r.getDouble(0), r.getDouble(1), r.getDouble(2)) == ((49.0, 94.0, 98.0)))
  }

  test("out-of-domain values clamp to the edge buckets") {
    val df = Seq(-5.0, 0.0, 2000.0, 3000.0).toDF("v")
    val r = df.agg(histQuantiles(col("v")).as("q"))
      .select(col("q.p50"), col("q.p99")).head()
    assert(r.getDouble(0) == 0.0) // half the mass in bucket 0
    assert(r.getDouble(1) == 8191 / 8.0) // clamped top bucket
  }

  test("estimates are bit-identical across partitionings and row orders") {
    val events = spark.read.parquet(s"$sf0001/events.parquet")
    def run(df: org.apache.spark.sql.DataFrame) = df
      .groupBy(col("event_type"))
      .agg(histQuantiles(round(col("value"), 6)).as("q"))
      .select(col("event_type"), col("q.p50"), col("q.p95"), col("q.p99"))
      .collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .sortBy(_._1)
    val a = run(events.repartition(1))
    val b = run(events.repartition(17, col("user_id")))
    val c = run(events.orderBy(desc("value")).repartition(3))
    assert(a.sameElements(b) && a.sameElements(c))
  }

  test("sketch percentile is within one bucket width of the exact percentile") {
    val events = spark.read.parquet(s"$sf0001/events.parquet")
    val sk = events.agg(histQuantiles(round(col("value"), 6)).as("q"))
      .select(col("q.p50")).head().getDouble(0)
    val exact = events.stat.approxQuantile("value", Array(0.5), 0.0).head
    assert(math.abs(sk - exact) <= 1.0 / HistogramBuffer.Scale + 1e-9,
      s"sketch p50 $sk vs exact $exact")
  }

  test("merge is plain vector addition") {
    val a = new HistogramBuffer
    val b = new HistogramBuffer
    a.add(1.0); a.add(2.0); b.add(2.0); b.add(700.0)
    a.merge(b)
    assert(a.total == 4)
    assert(a.counts(16) == 2) // 2.0 → bucket 16, counted from both sides
  }
}
