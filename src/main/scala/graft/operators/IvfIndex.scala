package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** IVF index family (`src/index/ivf/ivf.cc:66-1276`), Spark-first:
  *
  *   - Train (`ivf.cc:440-654`): k-means over a sample → centroid table
  *     (MLlib KMeans, or any explicit codebook DataFrame);
  *   - Add (`ivf.cc:656-689`): assign every base vector to its nearest
  *     centroid → index table `(id, vec, cluster_id)`; at scale this table
  *     is written `partitionBy("cluster_id")` so probing prunes files;
  *   - Search (`ivf.cc:691-810`): per query, pick the `nprobe` nearest
  *     centroids (broadcast centroids — tiny), then scan ONLY the probed
  *     partitions (Catalyst partition pruning does the mechanics; choosing
  *     the list set is this code). `nprobe = nlist` recovers exact search
  *     (the oracle-checked configuration); smaller nprobe trades recall for
  *     a 1/nlist-scaled scan, verified by recall tests.
  */
object IvfIndex {

  /** Add phase: nearest-centroid assignment, keeping the vector column. */
  def build(
      base: DataFrame, // (id, vec)
      centroids: DataFrame, // (cluster_id, centroid)
      roundDist: Option[Int] = None,
      metric: Metric = Metric.L2 // Hamming over packed bits = BIN_IVF_FLAT
  ): DataFrame = {
    val assigned = Cluster.assignToCentroids(base, centroids, roundDist, metric)
    base.join(assigned.select(col("id"), col("cluster_id")), "id")
  }

  /** Build-time per-list populations (cluster_id, n) as a LOCAL frame —
    * the metadata `ensure_topk_full` reads at search time. The reference
    * reads list sizes straight off the in-memory index (`ivf.cc:750-760`);
    * here they are one build-time aggregation pinned driver-side, so a
    * search never re-aggregates the index. Persist alongside the
    * centroids (both are tiny). */
  def listSizes(index: DataFrame): DataFrame = {
    val agg = index.groupBy(col("cluster_id")).agg(count(lit(1)).as("n"))
    index.sparkSession.createDataFrame(
      java.util.Arrays.asList(agg.collect(): _*), agg.schema)
  }

  /** Per-query probe list: the nprobe nearest centroids. */
  def probe(
      queries: DataFrame, // (qid, qvec)
      centroids: DataFrame,
      nprobe: Int,
      roundDist: Option[Int] = None,
      metric: Metric = Metric.L2
  ): DataFrame = {
    val d = {
      val raw = metric.dist(col("qvec"), col("centroid"))
      roundDist.map(n => round(raw, n)).getOrElse(raw)
    }
    val pairs = queries
      .crossJoin(broadcast(centroids))
      .select(col("qid"), col("cluster_id"), d.as("dist"))
    BruteForce
      .topK(pairs, nprobe, ascending = true, idCol = "cluster_id")
      .select(col("qid"), col("cluster_id"))
  }

  /** Probe, then PRUNE THE SCAN: the probe result (nq×nprobe pairs) is
    * collected — it is tiny by construction — and the probed list ids are
    * pushed into the index scan as a `cluster_id IN (...)` filter. Over a
    * `partitionBy("cluster_id")` parquet index this is Catalyst PARTITION
    * PRUNING (PartitionFilters in the plan — only probed list files are
    * read); over a cached frame it is a pushed scan filter. This is the
    * reference's nprobe contract (`ivf.cc:691-810`): search cost scales
    * with nprobe/nlist, NOT with the table.
    *
    * Returns (probes as a rebuilt local frame — no recompute on reuse —
    * and the pruned index). */
  def probeAndPrune(
      queries: DataFrame,
      index: DataFrame,
      centroids: DataFrame,
      nprobe: Int,
      roundDist: Option[Int],
      ensureTopkFull: Boolean = false,
      k: Int = 0,
      metric: Metric = Metric.L2,
      listSizes: Option[DataFrame] = None
  ): (DataFrame, DataFrame) = {
    val spark = index.sparkSession
    val probeDf = probe(queries, centroids, nprobe, roundDist, metric)
    var probeRows = probeDf.collect()
    if (ensureTopkFull && k > 0) {
      // `ensure_topk_full` (ivf.cc:750-760): queries whose probed lists
      // hold fewer than k vectors expand toward nprobe=nlist so k results
      // are guaranteed. List populations are BUILD-TIME metadata
      // ([[listSizes]], persisted with the centroids) — aggregating the
      // full index here would be a whole-index scan per search. The
      // fallback aggregate only runs for ad-hoc frames built without
      // metadata.
      val sizes = listSizes
        .getOrElse(index.groupBy(col("cluster_id")).agg(count(lit(1)).as("n")))
        .collect().map(r => r.get(0) -> r.getLong(1)).toMap
      val allLists = sizes.keys.toSeq
      val byQid = probeRows.groupBy(_.get(0))
      val expanded = byQid.flatMap { case (qid, rows) =>
        val probed = rows.map(_.get(1)).toSet
        val have = probed.iterator.map(c => sizes.getOrElse(c, 0L)).sum
        if (have >= k) rows.toSeq
        else rows.toSeq ++ allLists.filterNot(probed)
          .map(c => org.apache.spark.sql.Row(qid, c))
      }.toArray
      probeRows = expanded
    }
    val probesLocal = spark.createDataFrame(
      java.util.Arrays.asList(probeRows: _*), probeDf.schema)
    val probedIds = probeRows.map(_.get(1)).distinct.toSeq
    (probesLocal, index.filter(col("cluster_id").isInCollection(probedIds)))
  }

  /** Search: probe → scan ONLY probed lists → exact distance → top-k. */
  def search(
      queries: DataFrame, // (qid, qvec)
      index: DataFrame, // (id, vec, cluster_id) from build()
      centroids: DataFrame,
      k: Int,
      nprobe: Int,
      metric: Metric = Metric.L2,
      roundDist: Option[Int] = None,
      ensureTopkFull: Boolean = false,
      listSizes: Option[DataFrame] = None
  ): DataFrame = {
    val (probes, pruned) =
      probeAndPrune(queries, index, centroids, nprobe, roundDist, ensureTopkFull, k, metric,
        listSizes)
    val raw = metric.dist(col("qvec"), col("vec"))
    val d = roundDist.map(n => round(raw, n)).getOrElse(raw)
    val pairs = broadcast(probes.join(queries, "qid"))
      .join(pruned, "cluster_id")
      .select(col("qid"), col("id").as("nid"), d.as("dist"))
    BruteForce.topK(pairs, k, metric.ascending)
  }

  /** RangeSearch on the IVF index (`ivf.cc:812-917`): probe the `nprobe`
    * nearest lists, scan ONLY those lists, keep rows inside the two-sided
    * `(range_filter, radius)` bound — per-metric direction exactly as
    * [[BruteForce.rangeSearch]]. Approximate by construction (vectors in
    * unprobed lists are invisible), which is the reference's IVF range
    * contract too; `nprobe = nlist` recovers the exact result. `capK`
    * mirrors `range_search_k` (`config.h:599-601`): ≥0 keeps each query's
    * best capK in-range rows. The probed scan is the only base-table
    * touch, so a range query over a 100 TB index reads nprobe/nlist of
    * the files, same as kNN. */
  def rangeSearch(
      queries: DataFrame, // (qid, qvec)
      index: DataFrame, // (id, vec, cluster_id) from build()
      centroids: DataFrame,
      nprobe: Int,
      metric: Metric,
      radius: Double,
      rangeFilter: Double,
      roundDist: Option[Int] = None,
      capK: Int = -1
  ): DataFrame = {
    val (probes, pruned) =
      probeAndPrune(queries, index, centroids, nprobe, roundDist, metric = metric)
    val raw = metric.dist(col("qvec"), col("vec"))
    val d = roundDist.map(n => round(raw, n)).getOrElse(raw)
    val pairs = broadcast(probes.join(queries, "qid"))
      .join(pruned, "cluster_id")
      .select(col("qid"), col("id").as("nid"), d.as("dist"))
    val keep =
      if (metric.ascending) col("dist") >= rangeFilter && col("dist") < radius
      else col("dist") > radius && col("dist") <= rangeFilter
    val r = pairs.filter(keep)
    if (capK < 0) r
    else BruteForce.topK(r, capK, metric.ascending).select(col("qid"), col("nid"), col("dist"))
  }

  /** Build-time per-list BALL RADII (cluster_id, r): the max UNROUNDED
    * centroid distance over list members — metadata pinned local like
    * [[listSizes]], persisted with the centroids. Feeds the lossless range
    * prune in [[rangeSearchPruned]]. */
  def listRadii(index: DataFrame, centroids: DataFrame): DataFrame = {
    val agg = index
      .join(broadcast(centroids), "cluster_id")
      .groupBy(col("cluster_id"))
      .agg(max(Metric.L2.dist(col("vec"), col("centroid"))).as("r"))
    index.sparkSession.createDataFrame(
      java.util.Arrays.asList(agg.collect(): _*), agg.schema)
  }

  /** EXACT range search with geometric list pruning — the scale answer to
    * the reference's wasted-probe knob (`max_empty_result_buckets`,
    * index_param.h:101 / ivf.cc range path): instead of walking buckets
    * until m consecutive come back empty, the triangle inequality drops a
    * list up front whenever its centroid ball cannot intersect the
    * `[rangeFilter, radius)` shell — `d(q,c) − r > radius` (all members too
    * close to q is impossible… too FAR) or `d(q,c) + r < rangeFilter` (all
    * members inside the lower bound). The prune is LOSSLESS (ε covers the
    * 4dp result rounding), so the answer equals the full scan and the
    * full-corpus range oracle gates it — while the scan touches only the
    * surviving lists' files (PartitionFilters, same mechanics as
    * [[probeAndPrune]]). L2 only (the bound needs a metric space). */
  def rangeSearchPruned(
      queries: DataFrame, // (qid, qvec)
      index: DataFrame, // (id, vec, cluster_id) from build()
      centroids: DataFrame,
      radii: DataFrame, // (cluster_id, r) from listRadii()
      radius: Double,
      rangeFilter: Double,
      roundDist: Option[Int] = None
  ): DataFrame = {
    val eps = roundDist.map(n => math.pow(10d, -n)).getOrElse(0d)
    val dc = Metric.L2.dist(col("qvec"), col("centroid"))
    val cand = queries
      .crossJoin(broadcast(centroids.join(radii, "cluster_id")))
      .filter(dc - col("r") <= radius + eps && dc + col("r") >= rangeFilter - eps)
      .select(col("qid"), col("cluster_id"))
    // only the DISTINCT surviving list ids come to the driver (≤ nlist —
    // genuinely bounded even in the no-prune worst case, where the full
    // (qid, cluster_id) frame is nq × nlist and stays distributed; the
    // literal id list is what lets the scan prune partitions)
    val probedIds = cand
      .select(col("cluster_id")).distinct().collect().map(_.get(0)).toSeq
    val pruned = index.filter(col("cluster_id").isInCollection(probedIds))
    val raw = Metric.L2.dist(col("qvec"), col("vec"))
    val d = roundDist.map(n => round(raw, n)).getOrElse(raw)
    broadcast(cand.join(queries, "qid"))
      .join(pruned, "cluster_id")
      .select(col("qid"), col("id").as("nid"), d.as("dist"))
      .filter(col("dist") >= rangeFilter && col("dist") < radius)
  }

  /** AnnIterator over the IVF index (`ivf.cc:927-946` — IVFFlat/IVF_SQ8/
    * SCANN expose the iterator workflow; the faiss workspace streams
    * batches from the probed lists): the ranked stream is opened over the
    * PROBED pairs only — stream quality is nprobe-bounded exactly as the
    * reference's iterator quality is, and the open cost is the probed
    * scan, not a full-corpus ranking. Pages/refine/close ride the shared
    * [[AnnIteratorSession]] machinery. */
  def annIterator(
      queries: DataFrame, // (qid, qvec)
      index: DataFrame, // (id, vec, cluster_id) from build()
      centroids: DataFrame,
      nprobe: Int,
      metric: Metric = Metric.L2,
      roundDist: Option[Int] = None
  ): AnnIteratorSession = {
    val (probes, pruned) =
      probeAndPrune(queries, index, centroids, nprobe, roundDist, metric = metric)
    val raw = metric.dist(col("qvec"), col("vec"))
    val d = roundDist.map(n => round(raw, n)).getOrElse(raw)
    val pairs = broadcast(probes.join(queries, "qid"))
      .join(pruned, "cluster_id")
      .select(col("qid"), col("id").as("nid"), d.as("dist"))
    val ord =
      if (metric.ascending) Seq(col("dist").asc, col("nid").asc)
      else Seq(col("dist").desc, col("nid").asc)
    val ranked = pairs
      .withColumn("rnk",
        org.apache.spark.sql.functions.row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("qid")).orderBy(ord: _*)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    new AnnIteratorSession(ranked)
  }

  /** [[search]] over TRUE half-width packed lists — the IVF shape the
    * reference's fp16/bf16 element types exist for (`operands.h:48-147`:
    * lists store 2-byte elements, compute widens to fp32): the index
    * frame carries `vec` as BINARY(dim*2) (graft.plans.Half packing), so
    * the probed scan — the cost that scales with nprobe/nlist at 100 TB —
    * moves half the bytes. Probing stays on the fp32 centroid arrays
    * (broadcast-sized); queries are packed once, below the join. Values
    * are bit-identical to the value-grid rendering, so the same oracle
    * gates both. */
  def searchPacked(
      queries: DataFrame, // (qid, qvec ARRAY — fp16/bf16 grid values)
      index: DataFrame, // (id, vec BINARY packed, cluster_id)
      centroids: DataFrame, // (cluster_id, centroid ARRAY — grid values)
      k: Int,
      nprobe: Int,
      metric: Metric = Metric.L2,
      bf16: Boolean = false,
      roundDist: Option[Int] = None
  ): DataFrame = {
    import graft.functions.VectorFunctions.{dotPackedBf16, dotPackedFp16, l2SqPackedBf16, l2SqPackedFp16, packBf16, packFp16}
    val (probes, pruned) =
      probeAndPrune(queries, index, centroids, nprobe, roundDist, metric = metric)
    val qPacked = queries.select(col("qid"),
      (if (bf16) packBf16(col("qvec")) else packFp16(col("qvec"))).as("qp"))
    val l2sq = if (bf16) l2SqPackedBf16(col("qp"), col("vec"))
      else l2SqPackedFp16(col("qp"), col("vec"))
    val raw = metric match {
      case Metric.L2 => sqrt(l2sq)
      case Metric.L2Sq => l2sq
      case Metric.IP =>
        if (bf16) dotPackedBf16(col("qp"), col("vec")) else dotPackedFp16(col("qp"), col("vec"))
      case m => throw new IllegalArgumentException(s"packed IVF does not support metric ${m.name}")
    }
    val d = roundDist.map(n => round(raw, n)).getOrElse(raw)
    val pairs = broadcast(probes.join(qPacked, "qid"))
      .join(pruned, "cluster_id")
      .select(col("qid"), col("id").as("nid"), d.as("dist"))
    BruteForce.topK(pairs, k, metric.ascending)
  }

  /** IVF_SQ8 search: probe lists, rank candidates by SQ8 approx distance
    * (reconstructed codes), exact rerank on raw vectors — the composition
    * the reference registers as IVF_SQ8 (`ivf.cc:1244-1276`; SQ quantizer +
    * coarse lists). Global per-dim bounds (the reference's SQ trains bounds
    * over the whole input, not per list). */
  def searchSq8(
      queries: DataFrame, // (qid, qvec)
      index: DataFrame, // (id, vec, cluster_id)
      centroids: DataFrame,
      k: Int,
      nprobe: Int,
      reorderK: Int,
      roundDist: Option[Int] = None,
      stats: Option[DataFrame] = None // prebuilt quantizer model (Train once)
  ): DataFrame = {
    // quantizer bounds are GLOBAL (trained over the whole input, as the
    // reference's SQ does) — a build-time artifact; pass `stats` in a real
    // deployment so search never retrains
    val st = stats.getOrElse(Quantization.sq8Train(index.select(col("id"), col("vec"))))
    val (probes, pruned) = probeAndPrune(queries, index, centroids, nprobe, roundDist)
    // codes are computed over the PRUNED scan only — the probed lists are
    // the only data touched
    val coded = pruned
      .crossJoin(broadcast(st))
      .select(
        col("id"),
        col("cluster_id"),
        Quantization
          .sq8Recon(
            Quantization.sq8Code(col("vec"), col("mn"), col("mx")),
            col("mn"),
            col("mx"))
          .as("recon"))
    val rawA = graft.functions.VectorFunctions.l2(col("qvec"), col("recon"))
    val adist = roundDist.map(n => round(rawA, n)).getOrElse(rawA)
    val cand = BruteForce
      .topK(
        broadcast(probes.join(queries, "qid"))
          .join(coded, "cluster_id")
          .select(col("qid"), col("id").as("nid"), adist.as("dist")),
        reorderK,
        ascending = true)
      .join(broadcast(queries), "qid")
      .join(pruned.select(col("id").as("nid"), col("vec")), "nid")
    val rawE = graft.functions.VectorFunctions.l2(col("qvec"), col("vec"))
    val edist = roundDist.map(n => round(rawE, n)).getOrElse(rawE)
    BruteForce.topK(cand.select(col("qid"), col("nid"), edist.as("dist")), k, ascending = true)
  }

  /** IVF_PQ search: probe lists, rank candidates inside probed lists by
    * PQ asymmetric distance (ADC), exact rerank on raw vectors — the
    * composition the reference registers as IVF_PQ (`ivf.cc:1244-1276`;
    * PQ params m/nbits per `benchmark_float_qps.cpp:400-401`). Codes are
    * map-side projections against a broadcast-literal codebook; the probed
    * scan is the only data touched. */
  def searchPq(
      queries: DataFrame, // (qid, qvec)
      index: DataFrame, // (id, vec, cluster_id)
      centroids: DataFrame,
      model: ProductQuant.PQModel,
      k: Int,
      nprobe: Int,
      reorderK: Int,
      roundDist: Option[Int] = None
  ): DataFrame = {
    val (probes, pruned) = probeAndPrune(queries, index, centroids, nprobe, roundDist)
    // ADC codes are map-side projections over the PRUNED scan only
    val coded = pruned.select(
      col("id"),
      col("cluster_id"),
      ProductQuant.encodeExpr(col("vec"), model).as("codes"))
    val cand = ProductQuant
      .adcTopK(
        broadcast(probes.join(queries, "qid")),
        coded,
        model,
        reorderK,
        joinKey = Some("cluster_id"),
        roundDist = roundDist)
      .join(broadcast(queries), "qid")
      .join(pruned.select(col("id").as("nid"), col("vec")), "nid")
    val rawE = graft.functions.VectorFunctions.l2(col("qvec"), col("vec"))
    val edist = roundDist.map(n => round(rawE, n)).getOrElse(rawE)
    BruteForce.topK(cand.select(col("qid"), col("nid"), edist.as("dist")), k, ascending = true)
  }

  /** Train → centroid table (cluster_id, centroid): sample-bounded local
    * k-means (`LocalKMeans` — the faiss-Clustering subsample contract the
    * reference Train rides, `ivf.cc:440-654`). Training reads a bounded
    * sample however large the table; only Add/assign is distributed. The
    * MLlib path remains available as `Cluster.train` (V15). */
  def trainKMeans(spark: SparkSession, base: DataFrame, nlist: Int, seed: Long = 42L): DataFrame = {
    val sample = LocalKMeans.sampleVectors(base, cap = nlist * 256)
    // nlist is an upper bound: degenerate samples (fewer distinct points
    // than lists) would otherwise yield duplicate centroids and dead lists
    val cents = LocalKMeans.distinctCentroids(
      LocalKMeans.fit(sample, math.min(nlist, sample.length), maxIter = 15, seed = seed))
    import spark.implicits._
    cents.zipWithIndex
      .map { case (v, i) => (i.toLong, v) }
      .toSeq
      .toDF("cluster_id", "centroid")
  }
}
