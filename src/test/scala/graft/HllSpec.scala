package graft

import org.apache.spark.sql.functions._

import graft.plans.HllAgg.hllDistinct
import graft.plans.HllSketch

/** The HLL sketch aggregate: accuracy, partition-order invariance (the
  * property that lets an approximate estimate sit under the driver's exact
  * hash gate), and the register/estimate contract mirrored by the oracle.
  */
class HllSpec extends SparkSpec {

  private lazy val events = spark.read.parquet(s"$sf0001/events.parquet")

  test("estimate is within 10% of the exact distinct count") {
    val est = events
      .agg(hllDistinct(col("event_id")).as("e"))
      .head()
      .getDouble(0)
    val exact = events.select(col("event_id")).distinct().count().toDouble
    assert(math.abs(est - exact) / exact < 0.10, s"est=$est exact=$exact")
  }

  test("estimate is bit-identical across partitionings and row orders") {
    def run(df: org.apache.spark.sql.DataFrame): Array[(String, Double, Double)] = df
      .groupBy(col("event_type"))
      .agg(
        round(hllDistinct(col("user_id")), 4).as("u"),
        round(hllDistinct(col("event_id")), 4).as("e"))
      .collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
      .sortBy(_._1)

    val a = run(events.repartition(1))
    val b = run(events.repartition(32, col("user_id")))
    val c = run(events.orderBy(desc("event_id")).repartition(7))
    assert(a.sameElements(b) && a.sameElements(c))
  }

  test("linear-counting branch fires for small cardinalities") {
    // sf0.001 has 15 distinct users: nearly all registers empty → the
    // m·ln(m/V) correction, which the oracle reproduces exactly
    val s = new HllSketch
    (0 until 15).foreach(i => s.add(i.toString.getBytes("UTF-8")))
    val v0 = s.registers.count(_ == 0)
    assert(v0 > 0)
    assert(s.estimate == 256 * math.log(256.0 / v0))
  }

  test("rho is capped at 32 so every 2^-M_j term fits DECIMAL(38,35)") {
    val s = new HllSketch
    (0 until 100000).foreach(i => s.add(s"k$i".getBytes("UTF-8")))
    assert(s.registers.forall(r => (r & 0xff) <= 32))
  }

  test("null inputs are ignored") {
    val df = events.select(
      when(col("event_id") % 2 === 0, col("event_id")).as("maybe"))
    val est = df.agg(hllDistinct(col("maybe")).as("e")).head().getDouble(0)
    val exact = events.filter(col("event_id") % 2 === 0).select("event_id").distinct().count()
    assert(math.abs(est - exact) / exact < 0.15, s"est=$est exact=$exact")
  }
}
