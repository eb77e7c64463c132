package graft

import org.apache.spark.sql.functions._

import graft.operators._

/** IVF RangeSearch / AnnIterator (`ivf.cc:812-917`, `:927-946`) and the
  * bitset-filtered graph search (`faiss_hnsw.cc:734-779`). */
class IvfExtrasSpec extends SparkSpec {

  private lazy val emb = graft.sources.Tables.embeddings(spark, sf0001)
  private lazy val queries = emb
    .filter(col("vec_id") % 100 === 0)
    .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
  private lazy val base = emb.select(col("vec_id").as("id"), col("embedding").as("vec"))
  private lazy val cents = emb
    .filter(col("vec_id") % 50 === 0)
    .select(col("vec_id").as("cluster_id"), col("embedding").as("centroid"))
  private lazy val index = IvfIndex.build(base, cents, Some(4))
  private lazy val nlist = cents.count().toInt

  test("IVF rangeSearch at nprobe=nlist recovers the exact brute-force range") {
    val ivf = IvfIndex
      .rangeSearch(queries, index, cents, nlist, Metric.L2,
        radius = 1.33, rangeFilter = 0.5, roundDist = Some(4))
      .select("qid", "nid", "dist")
    val bf = BruteForce
      .rangeSearch(queries, base, Metric.L2, radius = 1.33, rangeFilter = 0.5,
        roundDist = Some(4))
      .select("qid", "nid", "dist")
    assert(ivf.exceptAll(bf).isEmpty && bf.exceptAll(ivf).isEmpty)
  }

  test("IVF rangeSearch at nprobe=1 returns a subset drawn from probed lists only") {
    val sub = IvfIndex.rangeSearch(queries, index, cents, 1, Metric.L2,
      radius = 1.33, rangeFilter = 0.5, roundDist = Some(4))
    val all = BruteForce.rangeSearch(queries, base, Metric.L2,
      radius = 1.33, rangeFilter = 0.5, roundDist = Some(4))
    assert(sub.select("qid", "nid").exceptAll(all.select("qid", "nid")).isEmpty)
    assert(sub.count() <= all.count())
  }

  test("IVF rangeSearch capK keeps each query's best capK in-range rows") {
    val capped = IvfIndex.rangeSearch(queries, index, cents, nlist, Metric.L2,
      radius = 1.4, rangeFilter = 0.0, roundDist = Some(4), capK = 3)
    val perQ = capped.groupBy("qid").count().collect()
    assert(perQ.forall(_.getLong(1) <= 3))
    // the kept rows are the nearest in-range ones: equal to rangeSearchCapped
    val bfCap = BruteForce.rangeSearchCapped(queries, base, Metric.L2,
      radius = 1.4, rangeFilter = 0.0, capK = 3, roundDist = Some(4))
    assert(capped.exceptAll(bfCap).isEmpty && bfCap.exceptAll(capped).isEmpty)
  }

  test("IVF annIterator pages partition the probed ranking; nprobe=nlist = exact iterator") {
    val sess = IvfIndex.annIterator(queries, index, cents, nlist, Metric.L2, Some(4))
    try {
      val p12 = sess.page(1, 5).union(sess.page(2, 5)).select("qid", "nid", "dist")
      val exact = BruteForce
        .knn(queries, base, 10, Metric.L2, roundDist = Some(4))
        .select("qid", "nid", "dist")
      assert(p12.exceptAll(exact).isEmpty && exact.exceptAll(p12).isEmpty)
    } finally sess.close()
  }

  test("segment merge: two same-codebook halves search identically to the whole build") {
    val median = base.selectExpr("percentile(id, 0.5)").head().getDouble(0).toLong
    def half(pred: org.apache.spark.sql.Column) = new graft.IvfFlatIndex(
      IvfIndex.build(base.filter(pred), cents, Some(4)), cents, Metric.L2,
      nprobe = 2, Some(4))
    val merged = half(col("id") <= median).merge(half(col("id") > median))
      .search(queries, 10, None)
    val whole = new graft.IvfFlatIndex(index, cents, Metric.L2, nprobe = 2, Some(4))
      .search(queries, 10, None)
    assert(merged.exceptAll(whole).isEmpty && whole.exceptAll(merged).isEmpty)
  }

  test("graph rangeSearch rows all lie inside the bound and inside the exact range set") {
    val graph = BruteForce
      .knnFused(
        emb.select(col("vec_id").as("qid"), col("embedding").as("qvec")),
        base, 5, Metric.L2, roundDist = Some(4), excludeSelf = true)
      .select(col("qid").as("src"), col("nid").as("dst"))
    val entries = emb.filter(col("vec_id") % 250 === 0).select(col("vec_id").as("nid"))
    val got = GraphSearch.rangeSearch(graph, base, queries, entries,
      ef = 16, iters = 2, Metric.L2, radius = 1.33, rangeFilter = 0.5, Some(4))
    assert(got.filter(col("dist") < 0.5 || col("dist") >= 1.33).isEmpty)
    val exact = BruteForce.rangeSearch(queries, base, Metric.L2,
      radius = 1.33, rangeFilter = 0.5, roundDist = Some(4))
    assert(got.select("qid", "nid").exceptAll(exact.select("qid", "nid")).isEmpty)
  }

  test("pruned range search equals the full scan while dropping lists") {
    val radii = IvfIndex.listRadii(index, cents)
    val got = IvfIndex
      .rangeSearchPruned(queries, index, cents, radii,
        radius = 1.3, rangeFilter = 0.5, roundDist = Some(4))
      .select("qid", "nid", "dist")
    val bf = BruteForce
      .rangeSearch(queries, base, Metric.L2, radius = 1.3, rangeFilter = 0.5,
        roundDist = Some(4))
      .select("qid", "nid", "dist")
    assert(got.exceptAll(bf).isEmpty && bf.exceptAll(got).isEmpty)
  }

  test("pruned range search drops far lists on clustered data") {
    // the geometric bound is data-dependent: on the uniform synthetic
    // embeddings every list ball spans the shell, so build tight,
    // well-separated clusters where the triangle inequality has teeth
    import spark.implicits._
    val pts = for {
      c <- 0 until 4; i <- 0 until 20
    } yield (c * 20L + i, Array.fill(8)(c * 10.0f) ++ Array(i * 0.01f))
    val cBase = pts.map { case (id, v) => (id, v.toSeq) }.toDF("id", "vec")
      .select(col("id"), col("vec").cast("array<float>").as("vec"))
    val cCents = pts.filter(_._1 % 20 == 0).map { case (id, v) => (id / 20, v.toSeq) }
      .toDF("cluster_id", "centroid")
      .select(col("cluster_id"), col("centroid").cast("array<float>").as("centroid"))
    val cIndex = IvfIndex.build(cBase, cCents, Some(4))
    val cRadii = IvfIndex.listRadii(cIndex, cCents)
    // one query at cluster 0's centroid, radius far below the 10·√8 ≈ 28.3
    // inter-cluster gap: only cluster 0's list can intersect the shell
    val q = Seq((0L, pts.head._2.toSeq)).toDF("qid", "qvec")
      .select(col("qid"), col("qvec").cast("array<float>").as("qvec"))
    val got = IvfIndex.rangeSearchPruned(q, cIndex, cCents, cRadii,
      radius = 1.0, rangeFilter = 0.0, roundDist = Some(4))
    val bf = BruteForce.rangeSearch(q, cBase, Metric.L2,
      radius = 1.0, rangeFilter = 0.0, roundDist = Some(4))
    assert(got.select("qid", "nid", "dist").exceptAll(bf.select("qid", "nid", "dist")).isEmpty)
    assert(bf.select("qid", "nid", "dist").exceptAll(got.select("qid", "nid", "dist")).isEmpty)
    val cand = q
      .crossJoin(broadcast(cCents.join(cRadii, "cluster_id")))
      .filter(
        Metric.L2.dist(col("qvec"), col("centroid")) - col("r") <= 1.0 + 1e-4 &&
          Metric.L2.dist(col("qvec"), col("centroid")) + col("r") >= 0.0 - 1e-4)
      .count()
    assert(cand == 1L, s"expected only cluster 0 to survive the prune, kept $cand")
  }

  test("filtered beam returns only allowed ids, subset of the unfiltered frontier") {
    val graph = BruteForce
      .knnFused(
        emb.select(col("vec_id").as("qid"), col("embedding").as("qvec")),
        base, 5, Metric.L2, roundDist = Some(4), excludeSelf = true)
      .select(col("qid").as("src"), col("nid").as("dst"))
    val entries = emb.filter(col("vec_id") % 250 === 0).select(col("vec_id").as("nid"))
    val allowed = emb.filter(col("label") % 2 === 0).select(col("vec_id").as("nid"))
    val res = GraphSearch.beamSearchFiltered(
      graph, base, queries, entries, allowed, k = 5, ef = 16, iters = 2,
      Metric.L2, Some(4))
    val allowedIds = allowed.collect().map(_.getLong(0)).toSet
    assert(res.select("nid").collect().forall(r => allowedIds(r.getLong(0))))
    // same traversal, unfiltered: every filtered hit must appear in its frontier
    val full = GraphSearch.beamSearch(graph, base, queries, entries,
      k = 16, ef = 16, iters = 2, Metric.L2, Some(4))
    assert(res.select("qid", "nid").exceptAll(full.select("qid", "nid")).isEmpty)
  }
}
