package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (JVM singleton via getOrCreate). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = {
    val s = SessionTuning.streaming(SparkSession
      .builder()
      .master("local[4]")
      .appName("knowherespark-test")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    SessionTuning.install(s)
    s
  }

  lazy val sf0001 = "/root/testdata/sf0.001"

  /** Reference recall metric: sorted-id set intersection / (nq·k)
    * (`tests/ut/utils.h:110-134`). */
  def recall(got: org.apache.spark.sql.DataFrame, truth: org.apache.spark.sql.DataFrame): Double = {
    val g = got.select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val t = truth.select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    if (t.isEmpty) 1.0 else g.intersect(t).size.toDouble / t.size
  }
}
