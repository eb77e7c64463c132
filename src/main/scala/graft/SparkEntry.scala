package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._
import graft.operators._
import graft.sources.Tables

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each `queries` entry exercises one operator from SURVEY.md §2; each
  * `oracleSql` entry is the DuckDB-equivalent ANSI SQL over the same parquet
  * tables. Distances are computed in DOUBLE and rounded (4 dp) *before*
  * ranking on both sides so ranking ties resolve identically (then broken by
  * neighbor id) — the reference itself compares results as sets at equal
  * distance (`tests/ut/utils.h:110-134`).
  */
object SparkEntry {

  /** Deterministic query subset: every 100th vector is a query. */
  private val QMOD = 100
  private val K = 10
  private val ROUND = Some(4)

  private def queryVecs(spark: SparkSession, dir: String): DataFrame =
    Tables
      .embeddings(spark, dir)
      .filter(col("vec_id") % QMOD === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))

  private def baseVecs(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir).select(col("vec_id").as("id"), col("embedding").as("vec"))

  /** DuckDB fragments shared by the vector oracles. */
  private object Sql {
    val qView =
      s"q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id % $QMOD = 0)"
    // L2: sequential double fold, same order as Spark's aggregate().
    val l2 =
      "round(sqrt(list_sum(list_transform(range(1, len(q.qv)+1), i -> " +
        "(CAST(q.qv[i] AS DOUBLE) - CAST(b.embedding[i] AS DOUBLE)) * " +
        "(CAST(q.qv[i] AS DOUBLE) - CAST(b.embedding[i] AS DOUBLE))))), 4)"
    val ip =
      "round(list_sum(list_transform(range(1, len(q.qv)+1), i -> " +
        "CAST(q.qv[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))), 4)"
    def norm(v: String): String =
      s"sqrt(list_sum(list_transform($v, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
    val cosine =
      "round(list_sum(list_transform(range(1, len(q.qv)+1), i -> " +
        "CAST(q.qv[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))) / (" +
        norm("q.qv") + " * " + norm("b.embedding") + "), 4)"

    def knn(distExpr: String, desc: Boolean): String = {
      val ord = if (desc) "dist DESC, nid ASC" else "dist ASC, nid ASC"
      s"""WITH $qView,
pairs AS (
  SELECT q.qid AS qid, b.vec_id AS nid, $distExpr AS dist
  FROM q CROSS JOIN embeddings b
)
SELECT qid, nid, dist, rnk FROM (
  SELECT qid, nid, dist,
         CAST(row_number() OVER (PARTITION BY qid ORDER BY $ord) AS INT) AS rnk
  FROM pairs
) WHERE rnk <= $K"""
    }
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("bf_knn_l2")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // S1 — brute-force exact kNN (brute_force.cc:104-265), L2 / IP / COSINE
    "bf_knn_l2" -> ((s, dir) =>
      BruteForce.knn(queryVecs(s, dir), baseVecs(s, dir), K, Metric.L2, roundDist = ROUND)),
    "bf_knn_ip" -> ((s, dir) =>
      BruteForce.knn(queryVecs(s, dir), baseVecs(s, dir), K, Metric.IP, roundDist = ROUND)),
    "bf_knn_cosine" -> ((s, dir) =>
      BruteForce.knn(queryVecs(s, dir), baseVecs(s, dir), K, Metric.Cosine, roundDist = ROUND)),
    // S2 — brute-force range search, two-sided L2 bound (range_util.h:22-25)
    "bf_range_l2" -> ((s, dir) =>
      BruteForce
        .rangeSearch(queryVecs(s, dir), baseVecs(s, dir), Metric.L2, radius = 1.3,
          rangeFilter = 0.5, roundDist = ROUND)
        .select(col("qid"), col("nid"), col("dist"))),
    // S12 — norm precompute (brute_force.cc:66-101)
    "vec_norms" -> ((s, dir) =>
      Tables
        .embeddings(s, dir)
        .select(col("vec_id"), round(normL2(col("embedding")), 4).as("norm"))),
    // V7 — GetVectorByIds (flat.cc:222-256): fetch raw vectors, summarized
    // hash-safely as (dim, rounded checksum).
    "get_vector_by_ids" -> ((s, dir) => {
      val ids = Tables.embeddings(s, dir).filter(col("vec_id") % 97 === 0).select(col("vec_id").as("id"))
      BruteForce
        .getVectorByIds(ids, baseVecs(s, dir))
        .select(
          col("id").as("vec_id"),
          size(col("vec")).as("dim"),
          round(aggregate(col("vec"), lit(0.0d), (a, x) => a + x.cast("double")), 4).as("checksum"))
    })
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "bf_knn_l2" -> Sql.knn(Sql.l2, desc = false),
    "bf_knn_ip" -> Sql.knn(Sql.ip, desc = true),
    "bf_knn_cosine" -> Sql.knn(Sql.cosine, desc = true),
    "bf_range_l2" ->
      s"""WITH ${Sql.qView},
pairs AS (
  SELECT q.qid AS qid, b.vec_id AS nid, ${Sql.l2} AS dist
  FROM q CROSS JOIN embeddings b
)
SELECT qid, nid, dist FROM pairs WHERE dist >= 0.5 AND dist < 1.3""",
    "vec_norms" ->
      s"SELECT vec_id, round(${Sql.norm("embedding")}, 4) AS norm FROM embeddings",
    "get_vector_by_ids" ->
      """SELECT vec_id, CAST(len(embedding) AS INT) AS dim,
round(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE))), 4) AS checksum
FROM embeddings WHERE vec_id % 97 = 0"""
  )
}
