package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators._

/** Unified index facade — the reference's `Index<IndexNode>` handle
  * (`include/knowhere/index/index.h:23-219`: config validation, dispatch,
  * capability probes) plus the factory (`src/index/index_factory.cc:45-70`).
  * Every verb returns a DataFrame; persistence is parquet (BinarySet ↔
  * partitioned tables, `index_node.h:371-401`).
  */
trait VectorIndex {
  def indexType: String
  def count: Long
  def dim: Int
  def hasRawData: Boolean = Capabilities.hasRawData(indexType)
  def search(queries: DataFrame, k: Int, filter: Option[Column] = None): DataFrame
  def rangeSearch(queries: DataFrame, radius: Double, rangeFilter: Double,
      filter: Option[Column] = None): DataFrame
  def getVectorByIds(ids: DataFrame): DataFrame
  /** Serialize: write the index tables under `dir`. */
  def save(dir: String): Unit
}

/** FLAT: the base table itself is the index (`src/index/flat/flat.cc`). */
final class FlatIndex(
    val base: DataFrame, // (id, vec)
    val metric: Metric,
    roundDist: Option[Int] = None
) extends VectorIndex {
  override def indexType: String = "FLAT"
  override lazy val count: Long = base.count()
  override lazy val dim: Int =
    base.select(max(size(col("vec")))).head().getInt(0)

  override def search(queries: DataFrame, k: Int, filter: Option[Column]): DataFrame =
    BruteForce.knn(queries, base, k, metric, filter, roundDist)

  override def rangeSearch(queries: DataFrame, radius: Double, rangeFilter: Double,
      filter: Option[Column]): DataFrame =
    BruteForce.rangeSearch(queries, base, metric, radius, rangeFilter, filter, roundDist)

  override def getVectorByIds(ids: DataFrame): DataFrame =
    BruteForce.getVectorByIds(ids, base)

  override def save(dir: String): Unit =
    base.write.mode("overwrite").parquet(s"$dir/base")
}

/** IVF_FLAT: coarse-quantized lists, probed search (`src/index/ivf/ivf.cc`). */
final class IvfFlatIndex(
    val index: DataFrame, // (id, vec, cluster_id)
    val centroids: DataFrame, // (cluster_id, centroid)
    val metric: Metric,
    val nprobe: Int,
    roundDist: Option[Int] = None
) extends VectorIndex {
  override def indexType: String = "IVF_FLAT"
  override lazy val count: Long = index.count()
  override lazy val dim: Int = index.select(max(size(col("vec")))).head().getInt(0)

  override def search(queries: DataFrame, k: Int, filter: Option[Column]): DataFrame = {
    val filtered = filter.map(index.filter).getOrElse(index)
    IvfIndex.search(queries, filtered, centroids, k, nprobe, metric, roundDist)
  }

  /** Range search scans all lists — nprobe=nlist, exact within bound
    * (`ivf.cc:854-868`). */
  override def rangeSearch(queries: DataFrame, radius: Double, rangeFilter: Double,
      filter: Option[Column]): DataFrame =
    BruteForce.rangeSearch(
      queries, index.select(col("id"), col("vec")), metric, radius, rangeFilter, filter, roundDist)

  override def getVectorByIds(ids: DataFrame): DataFrame =
    BruteForce.getVectorByIds(ids, index.select(col("id"), col("vec")))

  override def save(dir: String): Unit = {
    index.write.mode("overwrite").partitionBy("cluster_id").parquet(s"$dir/lists")
    centroids.write.mode("overwrite").parquet(s"$dir/centroids")
  }
}

/** Factory — `(index_type, params) → index`, `index_factory.cc:45-70`. */
object IndexFactory {

  def build(
      spark: SparkSession,
      indexType: String,
      base: DataFrame, // (id, vec)
      metric: Metric = Metric.L2,
      nlist: Int = 16,
      nprobe: Int = 4,
      seed: Long = 42L,
      roundDist: Option[Int] = None
  ): VectorIndex = {
    require(Capabilities.IndexTypes.contains(indexType), s"unknown index type $indexType")
    require(Capabilities.supportsMetric(indexType, metric.name),
      s"index $indexType does not support metric ${metric.name}")
    indexType match {
      case "FLAT" | "BIN_FLAT" => new FlatIndex(base, metric, roundDist)
      case "IVF_FLAT" =>
        val cents = IvfIndex.trainKMeans(spark, base, nlist, seed)
        new IvfFlatIndex(IvfIndex.build(base, cents, roundDist), cents, metric, nprobe, roundDist)
      case other =>
        throw new IllegalArgumentException(s"index type $other not yet constructible via factory")
    }
  }

  /** Deserialize an IVF index saved by IvfFlatIndex.save. */
  def loadIvf(
      spark: SparkSession,
      dir: String,
      metric: Metric = Metric.L2,
      nprobe: Int = 4,
      roundDist: Option[Int] = None
  ): IvfFlatIndex =
    new IvfFlatIndex(
      spark.read.parquet(s"$dir/lists"),
      spark.read.parquet(s"$dir/centroids"),
      metric,
      nprobe,
      roundDist)
}
