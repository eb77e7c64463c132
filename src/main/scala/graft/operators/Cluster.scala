package graft.operators

import org.apache.spark.ml.clustering.{KMeans, KMeansModel}
import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Standalone clustering — the reference's `Cluster` verb surface
  * (`include/knowhere/cluster/cluster_node.h:24-49`,
  * `src/cluster/cluster.cc:36-66`): Train → centroids, Assign → per-row
  * cluster id, GetCentroids. Train maps to MLlib KMeans (the reference runs
  * faiss k-means with an Elkan-accelerated quantizer, `ivf.cc:492-530`);
  * Assign is a pure relational argmin over broadcast centroids and is what
  * IVF probing reuses.
  */
object Cluster {

  /** Train: MLlib KMeans over `(id, vec ARRAY<FLOAT>)`. Returns the model;
    * centroids via [[centroids]]. Deterministic for a fixed seed. */
  def train(df: DataFrame, k: Int, seed: Long = 42L, maxIter: Int = 20, vecCol: String = "vec"): KMeansModel =
    new KMeans()
      .setK(k)
      .setSeed(seed)
      .setMaxIter(maxIter)
      .setFeaturesCol("features")
      .setPredictionCol("cluster_id")
      .fit(df.withColumn("features", array_to_vector(col(vecCol))))

  /** GetCentroids as a DataFrame (cluster_id, centroid ARRAY<DOUBLE>). */
  def centroids(spark: org.apache.spark.sql.SparkSession, model: KMeansModel): DataFrame = {
    import spark.implicits._
    model.clusterCenters.zipWithIndex
      .map { case (v, i) => (i, v.toArray) }
      .toSeq
      .toDF("cluster_id", "centroid")
  }

  /** Assign via the trained model (`model.transform` — reference
    * `Cluster::Assign`). */
  def assign(df: DataFrame, model: KMeansModel, vecCol: String = "vec"): DataFrame =
    model
      .transform(df.withColumn("features", array_to_vector(col(vecCol))))
      .drop("features")

  /** Relational Assign: nearest centroid per row over an explicit centroid
    * table — broadcast centroids, argmin distance, ties broken by lowest
    * cluster_id. This is the oracle-checkable path and the kernel IVF
    * probing reuses (`ivf.cc:656-689` Add = assign-to-list).
    */
  def assignToCentroids(
      vectors: DataFrame, // (id, vec)
      centroidDf: DataFrame, // (cluster_id, centroid)
      roundDist: Option[Int] = None,
      metric: Metric = Metric.L2
  ): DataFrame = {
    val raw = metric.dist(col("vec"), col("centroid"))
    val d = roundDist.map(n => round(raw, n)).getOrElse(raw)
    val pairs = vectors
      .crossJoin(broadcast(centroidDf))
      .select(col("id"), col("cluster_id"), d.as("dist"))
    BruteForce
      .topK(pairs, 1, ascending = true, qidCol = "id", idCol = "cluster_id")
      .drop("rnk")
  }
}
