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

  /** Pages the last [[rangeSearchEarlyStop]] touched — a test probe. */
  @volatile var lastPagesTouched: Int = 0

  /** Iterator-backed range search with EARLY TERMINATION — the reference's
    * default RangeSearch runs through the AnnIterator and stops once the
    * stream leaves the radius (`index_node.h:190-291`, the
    * `range_search_level` overrun heuristics). Composition of the lazy
    * chunked session with the two-sided bound: pages are best-first, so a
    * query whose page slice contributes ZERO rows inside the FAR bound can
    * never contribute again and leaves the frontier; the scan stops when no
    * query is active. A huge-radius query degrades to the exhaustive scan;
    * a tight-radius query touches a few pages of the persisted stream
    * instead of ranking all nq×nb rows. Termination tests only the far
    * bound (`radius`): the near bound (`range_filter`) excludes rows that
    * arrive EARLY in a best-first stream, so it filters output but must
    * never stop a query. Output ≡ [[BruteForce.rangeSearch]]. */
  def rangeSearchEarlyStop(
      queries: DataFrame, // (qid, qvec)
      base: DataFrame, // (id, vec)
      metric: Metric,
      radius: Double,
      rangeFilter: Double,
      pageSize: Int = 1024,
      roundDist: Option[Int] = None
  ): DataFrame = {
    require(pageSize > 0, s"pageSize must be positive, got $pageSize")
    val session = openLazy(queries, base, metric, roundDist)
    val inFar =
      if (metric.ascending) col("dist") < radius else col("dist") > radius
    val keep =
      if (metric.ascending) col("dist") >= rangeFilter && col("dist") < radius
      else col("dist") > radius && col("dist") <= rangeFilter
    val nb = base.count()
    var active = queries.select(col("qid")).collect().map(_.get(0)).toSet
    var out: Option[DataFrame] = None
    var slices = List.empty[DataFrame]
    var p = 1
    while (active.nonEmpty && (p - 1).toLong * pageSize < nb) {
      // rank only the still-active queries' streams for this page window
      val slice = BruteForce
        .topK(session.pairs.filter(col("qid").isInCollection(active)), p * pageSize,
          metric.ascending)
        .filter(col("rnk") > (p - 1) * pageSize)
        .select(col("qid"), col("nid"), col("dist"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      slices ::= slice
      // nq-bounded driver probe: which queries still yield in-bound rows
      active = slice.filter(inFar).select(col("qid")).distinct()
        .collect().map(_.get(0)).toSet
      val contrib = slice.filter(keep)
      out = Some(out.map(_.union(contrib)).getOrElse(contrib))
      p += 1
    }
    lastPagesTouched = p - 1
    val result = out match {
      case Some(df) =>
        // materialize before releasing the page slices and the stream
        df.localCheckpoint(eager = true)
      case None =>
        queries.limit(0).select(
          col("qid"), lit(0L).as("nid"), lit(0.0d).as("dist"))
    }
    slices.foreach(_.unpersist())
    session.close()
    result
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
