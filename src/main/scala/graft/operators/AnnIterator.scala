package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** AnnIterator with RESUME STATE — V6/S4 (`index_node.h:451-679`; the
  * brute-force `PrecomputedDistanceIterator`, `brute_force.cc:750-876`,
  * computes every distance per query up front and partial-sorts lazily).
  *
  * Batch rendering: `open()` computes and PERSISTS the ranked distance
  * stream once; `page(p)` filters a rank range out of the cached frame —
  * unlike the round-1 pagination analog, page p never recomputes the
  * top-(p·size) prefix. `close()` releases the cache.
  *
  * Refine (`iterator_refine_ratio` / `retain_iterator_order`,
  * `config.h:602-612`, refine loop `index_node.h:538-567`): open the
  * stream on an APPROX distance (e.g. SQ8-reconstructed), over-fetch each
  * page by `refineRatio`, exact-rerank the window, and emit the page in
  * exact order — candidates arrive in approx order (the iterator
  * contract), results leave in refined order.
  */
final class AnnIteratorSession(val ranked: DataFrame /* (qid, nid, dist, rnk) */) {

  /** Page p (1-based): ranks ((p−1)·pageSize, p·pageSize] — a cached-scan
    * filter, no recomputation. */
  def page(p: Int, pageSize: Int): DataFrame =
    ranked.filter(col("rnk") > (p - 1) * pageSize && col("rnk") <= p * pageSize)

  /** Refined page: approx ranks ≤ p·pageSize·refineRatio are exact-scored
    * against the raw vectors and re-ranked; the page is emitted in EXACT
    * order (retain_iterator_order analog). */
  def refinedPage(
      queries: DataFrame, // (qid, qvec)
      base: DataFrame, // (id, vec)
      p: Int,
      pageSize: Int,
      refineRatio: Int,
      metric: Metric,
      roundDist: Option[Int] = None
  ): DataFrame = {
    val cands = ranked
      .filter(col("rnk") <= p.toLong * pageSize * refineRatio)
      .select(col("qid"), col("nid"))
    val raw = metric.dist(col("qvec"), col("vec"))
    val d = roundDist.map(n => round(raw, n)).getOrElse(raw)
    val exact = cands
      .join(base.select(col("id").as("nid"), col("vec")), "nid")
      .join(broadcast(queries), "qid")
      .select(col("qid"), col("nid"), d.as("dist"))
    val ord =
      if (metric.ascending) Seq(col("dist").asc, col("nid").asc)
      else Seq(col("dist").desc, col("nid").asc)
    exact
      .withColumn("rnk",
        row_number().over(Window.partitionBy(col("qid")).orderBy(ord: _*)))
      .filter(col("rnk") > (p - 1) * pageSize && col("rnk") <= p * pageSize)
  }

  def close(): Unit = ranked.unpersist()
}

/** Lazy-chunk iterator session — the `index_node.h:648-669` analog: the
  * reference's PrecomputedDistanceIterator computes all distances up front
  * but only PARTIAL-SORTS them, one chunk at a time, as pages are consumed.
  * Here `open` persists the UNRANKED distance stream; each `page(p)` runs
  * the bounded-heap top-(p·size) aggregate (O(nb·log(p·size)) per query,
  * map-side partial, shuffle ≤ p·size rows per query per partition) instead
  * of a global per-query sort. Opening on a huge base costs one distance
  * scan, never a full sort.
  */
final class LazyAnnIteratorSession(
    val pairs: DataFrame, /* (qid, nid, dist) — persisted, unranked */
    ascending: Boolean) {

  /** Page p (1-based): ranks ((p−1)·pageSize, p·pageSize] via a k-bounded
    * heap with k = p·pageSize — only the consumed prefix is ever ordered. */
  def page(p: Int, pageSize: Int): DataFrame =
    BruteForce.topK(pairs, p * pageSize, ascending)
      .filter(col("rnk") > (p - 1) * pageSize)

  def close(): Unit = pairs.unpersist()
}

object AnnIteratorOp {

  /** Rank ALL base rows per query by `distCol(qvec, vec)` and persist the
    * stream. The per-query full ranking is the iterator's inherent cost
    * (the reference precomputes nq×nb distances the same way); the window
    * is partitioned by qid so the sort distributes per query. */
  def open(
      queries: DataFrame, // (qid, qvec)
      base: DataFrame, // (id, vec)
      metric: Metric,
      roundDist: Option[Int] = None,
      distOverride: Option[org.apache.spark.sql.Column] = None
  ): AnnIteratorSession = {
    val raw = distOverride.getOrElse(metric.dist(col("qvec"), col("vec")))
    val d = roundDist.map(n => round(raw, n)).getOrElse(raw)
    val pairs = broadcast(queries)
      .crossJoin(base)
      .select(col("qid"), col("id").as("nid"), d.as("dist"))
    val ord =
      if (metric.ascending) Seq(col("dist").asc, col("nid").asc)
      else Seq(col("dist").desc, col("nid").asc)
    val ranked = pairs
      .withColumn("rnk",
        row_number().over(Window.partitionBy(col("qid")).orderBy(ord: _*)))
      .persist(StorageLevel.MEMORY_AND_DISK)
    new AnnIteratorSession(ranked)
  }

  /** Lazy open: persist the distance stream WITHOUT ranking it. Pages
    * partial-sort on demand (`LazyAnnIteratorSession.page`) — the
    * partial-sort-in-chunks contract of `index_node.h:648-669`. */
  def openLazy(
      queries: DataFrame, // (qid, qvec)
      base: DataFrame, // (id, vec)
      metric: Metric,
      roundDist: Option[Int] = None,
      distOverride: Option[org.apache.spark.sql.Column] = None
  ): LazyAnnIteratorSession = {
    val raw = distOverride.getOrElse(metric.dist(col("qvec"), col("vec")))
    val d = roundDist.map(n => round(raw, n)).getOrElse(raw)
    val pairs = broadcast(queries)
      .crossJoin(base)
      .select(col("qid"), col("id").as("nid"), d.as("dist"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    new LazyAnnIteratorSession(pairs, metric.ascending)
  }
}
