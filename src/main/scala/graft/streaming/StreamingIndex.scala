package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.operators.{BruteForce, Metric}

/** Streaming append + concurrent search — the Spark rendering of the
  * reference's `*_CC` concurrent-append indexes (IVF_FLAT_CC / SPARSE_*_CC:
  * `ivf.cc:1250-1262`, `sparse_index_node.cc:431-470`), where Add runs on
  * the build pool while Search proceeds against a consistent view.
  *
  * Spark shape: Structured Streaming micro-batch append into a *growing*
  * parquet segment; a search reads a snapshot = union(sealed segment,
  * growing segment as of now). Parquet's immutable files give the
  * snapshot isolation the reference gets from its growing-segment
  * epoch scheme (`ssize` granularity).
  */
object StreamingIndex {

  /** Start ingesting a stream of vector rows into the growing segment. */
  def startAppend(
      spark: SparkSession,
      sourceDir: String,
      schema: StructType,
      growingDir: String,
      checkpointDir: String
  ): StreamingQuery =
    spark.readStream
      .schema(schema)
      .parquet(sourceDir)
      .writeStream
      .format("parquet")
      .option("path", growingDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()

  /** IVF_FLAT_CC analog (`ivf.cc:1250-1262`): each arriving micro-batch is
    * ASSIGNED to its nearest list in-flight and appended to the growing
    * partitioned segment — probed search over the snapshot prunes sealed
    * and growing lists alike, while ingestion keeps running. */
  def startAppendIvf(
      spark: SparkSession,
      sourceDir: String,
      schema: StructType,
      centroids: DataFrame,
      growingDir: String,
      checkpointDir: String
  ): StreamingQuery =
    spark.readStream
      .schema(schema)
      .parquet(sourceDir)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        graft.operators.IvfIndex
          .build(batch.toDF(), centroids)
          .write.mode("append").partitionBy("cluster_id").parquet(growingDir)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()

  /** Snapshot view: sealed ∪ growing (empty growing dir tolerated). */
  def snapshot(spark: SparkSession, sealedDf: DataFrame, growingDir: String): DataFrame = {
    val growing =
      try {
        val g = spark.read.schema(sealedDf.schema).parquet(growingDir)
        if (g.isEmpty) sealedDf.limit(0) else g
      } catch { case _: Throwable => sealedDf.limit(0) }
    sealedDf.unionByName(growing)
  }

  /** Search concurrent with ingestion: exact kNN over the current snapshot. */
  def searchSnapshot(
      spark: SparkSession,
      queries: DataFrame,
      sealedDf: DataFrame,
      growingDir: String,
      k: Int,
      metric: Metric = Metric.L2
  ): DataFrame =
    BruteForce.knn(queries, snapshot(spark, sealedDf, growingDir), k, metric)
}
