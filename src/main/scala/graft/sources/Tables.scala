package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated test tables (TESTDATA.md).
  *
  * In the reference, input data arrives as an in-memory `DataSet`
  * (tensor/rows/dim — include/knowhere/dataset.h:29-304). Here the universal
  * container is a DataFrame read from parquet; `dim` is a schema invariant of
  * the `embedding ARRAY<FLOAT>` column rather than stored per row
  * (SURVEY.md §1.5).
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
  def documents(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "documents")
  def lineitem(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "orders")
  /** events.parquet's `ts` physical type has varied across driver data
    * generations: TIMESTAMP(NANOS) (readable only as LONG under
    * spark.sql.legacy.parquet.nanosAsLong=true, set by Verify/Bench
    * sessions) and TIMESTAMP(MICROS, isAdjustedToUTC=false) (read as
    * TIMESTAMP_NTZ). Normalize either to a microsecond TIMESTAMP column —
    * sessions run with spark.sql.session.timeZone=UTC, so the NTZ cast is
    * the identity on the stored instant. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = table(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts DIV 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts",
          org.apache.spark.sql.functions.col("ts")
            .cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
  }
  def customer(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "customer")
  def part(spark: SparkSession, dir: String): DataFrame       = table(spark, dir, "part")
  def supplier(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "supplier")
  def nation(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "region")
}
