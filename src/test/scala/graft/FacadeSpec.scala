package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.{AsyncBuild, BruteForce, GraphSearch, IndexStatic, Metric}
import graft.sources.Tables

/** V12 factory + V16 Index handle semantics. */
class FacadeSpec extends SparkSpec {

  private lazy val base = Tables
    .embeddings(spark, sf0001)
    .select(col("vec_id").as("id"), col("embedding").as("vec"))

  private lazy val queries = Tables
    .embeddings(spark, sf0001)
    .filter(col("vec_id") % 100 === 0)
    .select(col("vec_id").as("qid"), col("embedding").as("qvec"))

  test("FLAT via factory equals direct brute force; meta verbs work") {
    val idx = IndexFactory.build(spark, "FLAT", base, Metric.L2)
    assert(idx.hasRawData)
    assert(idx.count == 500L)
    assert(idx.dim == 64)
    val a = idx.search(queries, 5).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = BruteForce.knn(queries, base, 5, Metric.L2).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b)
  }

  test("factory version gating: in-range versions build, out-of-range refuse") {
    import graft.operators.Capabilities
    val ok = IndexFactory.build(spark, "FLAT", base, Metric.L2,
      version = Capabilities.MinVersion)
    assert(ok.indexType == "FLAT")
    intercept[IllegalArgumentException] {
      IndexFactory.build(spark, "FLAT", base, Metric.L2,
        version = Capabilities.CurrentVersion + 1)
    }
    intercept[IllegalArgumentException] {
      IndexFactory.build(spark, "FLAT", base, Metric.L2, version = -1)
    }
    // mmap bit: in-memory kinds map, the disk-native layout does not
    assert(Capabilities.supportsMmap("IVF_FLAT") && !Capabilities.supportsMmap("DISKANN"))
  }

  test("IVF_FLAT save/load round-trip preserves search results") {
    val idx = IndexFactory
      .build(spark, "IVF_FLAT", base, Metric.L2, nlist = 4, nprobe = 2, roundDist = Some(4))
      .asInstanceOf[IvfFlatIndex]
    val dir = Files.createTempDirectory("graft-facade").toString
    idx.save(dir)
    val loaded = IndexFactory.loadIvf(spark, dir, Metric.L2, nprobe = 2, roundDist = Some(4))
    val a = idx.search(queries, 5, None).collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val b = loaded.search(queries, 5, None).collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(a == b)
  }

  test("IVF probing prunes the scan: PartitionFilters on a saved index, pushed filter in-memory") {
    val idx = IndexFactory
      .build(spark, "IVF_FLAT", base, Metric.L2, nlist = 4, nprobe = 2, roundDist = Some(4))
      .asInstanceOf[IvfFlatIndex]
    val dir = Files.createTempDirectory("graft-prune").toString
    idx.save(dir) // partitionBy("cluster_id") parquet
    val loaded = IndexFactory.loadIvf(spark, dir, Metric.L2, nprobe = 2, roundDist = Some(4))
    val result = loaded.search(queries, 5, None)
    val plan = result.queryExecution.executedPlan.toString
    // the probed list ids must reach the LISTS file scan as partition
    // pruning — only probed list directories are read (ivf.cc:691-810)
    val listsScan = plan.linesIterator
      .find(l => l.contains("FileScan") && l.contains("/lists"))
      .getOrElse(fail(s"no lists FileScan in plan:\n$plan"))
    val pf = listsScan.substring(listsScan.indexOf("PartitionFilters"))
      .takeWhile(_ != ']') + "]"
    assert(pf.contains("cluster_id"), s"PartitionFilters should bind cluster_id: $listsScan")
    assert(!pf.replaceAll("\\s", "").contains("PartitionFilters:[]"),
      s"PartitionFilters must be non-empty: $listsScan")
    // and the pruned search returns the same rows as the in-memory index
    val a = idx.search(queries, 5, None).collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val b = result.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(a == b)
  }

  test("IVF_SQ8 and IVF_PQ build/save/load round-trips are search-identical") {
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val sq8 = IndexFactory
      .build(spark, "IVF_SQ8", base, Metric.L2, nlist = 4, nprobe = 4, roundDist = Some(4))
      .asInstanceOf[IvfSq8Index]
    val dirS = Files.createTempDirectory("graft-sq8").toString
    sq8.save(dirS)
    val sq8L = IndexFactory.loadIvfSq8(spark, dirS, nprobe = 4, roundDist = Some(4))
    assert(rows(sq8.search(queries, 5, None)) == rows(sq8L.search(queries, 5, None)))
    // SCANN-style with_raw_data: raw vectors retained, so the fetch works
    assert(sq8.hasRawData)
    val fetched = sq8.getVectorByIds(base.select(col("id")).limit(3))
    assert(fetched.count() == 3 && fetched.columns.contains("vec"))

    val pq = IndexFactory
      .build(spark, "IVF_PQ", base, Metric.L2, nlist = 4, nprobe = 4, roundDist = Some(4))
      .asInstanceOf[IvfPqIndex]
    val dirP = Files.createTempDirectory("graft-pq").toString
    pq.save(dirP)
    val pqL = IndexFactory.loadIvfPq(spark, dirP, nprobe = 4, roundDist = Some(4))
    assert(rows(pq.search(queries, 5, None)) == rows(pqL.search(queries, 5, None)))
  }

  test("DISKANN build/save/load round-trip is search-identical") {
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val da = IndexFactory
      .build(spark, "DISKANN", base, Metric.L2, nlist = 4, reorderK = 16, roundDist = Some(4))
      .asInstanceOf[graft.operators.DiskAnnIndex]
    val dir = Files.createTempDirectory("graft-diskann").toString
    da.save(dir)
    val daL = IndexFactory.loadDiskAnn(spark, dir,
      searchListSize = 16, beamIters = 4, roundDist = Some(4))
    assert(rows(da.search(queries, 5, None)) == rows(daL.search(queries, 5, None)))
    assert(da.hasRawData && da.getVectorByIds(base.select(col("id")).limit(2)).count() == 2)
    // search_list_size must cover k (diskann_config.h:172-183 validation)
    assertThrows[IllegalArgumentException](daL.search(queries, 20, None))
  }

  test("HNSW family via factory: build, recall floor, save/load round-trip, aliases") {
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val exact = BruteForce.knn(queries, base, 5, Metric.L2, roundDist = Some(4))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for (t <- Seq("HNSW", "HNSW_SQ", "HNSW_PQ", "HNSW_PRQ")) {
      val idx = IndexFactory
        .build(spark, t, base, Metric.L2, nlist = 4, reorderK = 32, roundDist = Some(4))
      assert(idx.indexType == t)
      assert(idx.hasRawData) // refine-flat: raw tier retained
      val got = idx.search(queries, 5, None)
      val hits = got.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val recall = (hits & exact).size.toDouble / exact.size
      assert(recall >= 0.6, s"$t recall $recall below the ANN floor")
      if (t == "HNSW") {
        // the handle's default Exact walk is the CONVERGED beam (per-query
        // adaptive stop): it must have terminated on its own, not the cap
        assert(GraphSearch.lastConvergedHops > 0 && GraphSearch.lastConvergedHops < 16,
          s"adaptive walk took ${GraphSearch.lastConvergedHops} hops")
      }
      // filtered search: answers obey the predicate, traversal still routes
      val filtered = idx.search(queries, 5, Some(col("id") % 2 === 0))
      assert(filtered.collect().forall(_.getLong(1) % 2 == 0))
    }
    // save/load round-trip is search-identical (quantized variant carries
    // its codebooks through the artifact)
    val sq = IndexFactory
      .build(spark, "HNSW_SQ", base, Metric.L2, nlist = 4, reorderK = 32, roundDist = Some(4))
      .asInstanceOf[graft.operators.HnswIndex]
    val dir = Files.createTempDirectory("graft-hnsw").toString
    sq.save(dir)
    val sqL = IndexFactory.loadHnsw(spark, dir, Metric.L2, efSearch = 32,
      beamIters = 4, roundDist = Some(4))
    assert(rows(sq.search(queries, 5, None)) == rows(sqL.search(queries, 5, None)))
    assert(sqL.indexType == "HNSW_SQ")
    // meta comes from the build-time header, not a graph scan
    assert(sqL.indexMetaJson.contains("\"degree\":"))
  }

  test("BIN_IVF_FLAT via factory: hamming probe over packed binary vectors") {
    import graft.functions.VectorFunctions.signBits
    val packed = base.select(col("id"), signBits(col("vec")).as("vec"))
    val idx = IndexFactory.build(spark, "BIN_IVF_FLAT", packed, Metric.Hamming,
      nlist = 4, nprobe = 4)
    assert(idx.indexType == "BIN_IVF_FLAT" && idx.hasRawData)
    // nprobe = nlist → exact: each query's own vector is its top hit
    val probe = packed.limit(3).select(col("id").as("qid"), col("vec").as("qvec"))
    val top1 = idx.search(probe, 1, None).collect()
    assert(top1.forall(r => r.getDouble(2) == 0.0))
  }

  test("SCANN and CC aliases build the shared artifact under their own name") {
    val scann = IndexFactory.build(spark, "SCANN", base, Metric.L2, nlist = 4, nprobe = 4)
    assert(scann.indexType == "SCANN" && scann.hasRawData)
    assert(scann.search(queries, 5, None).count() == queries.count() * 5)
    val cc = IndexFactory.build(spark, "IVF_FLAT_CC", base, Metric.L2, nlist = 4, nprobe = 4)
    assert(cc.indexType == "IVF_FLAT_CC")
    assert(graft.operators.Capabilities.supportsConcurrentAppend("IVF_FLAT_CC"))
    val sqcc = IndexFactory.build(spark, "IVF_SQ_CC", base, Metric.L2, nlist = 4, nprobe = 4)
    assert(sqcc.indexType == "IVF_SQ_CC")
    // CC growing-segment semantics: append assigns into the FIXED lists
    // (no retrain) and the appended vectors are immediately searchable
    val half = base.filter(col("id") < 250L)
    val rest = base.filter(col("id") >= 250L)
    val grown = IndexFactory
      .build(spark, "IVF_FLAT_CC", half, Metric.L2, nlist = 4, nprobe = 4)
      .asInstanceOf[IvfFlatIndex]
      .append(rest)
    assert(grown.count == 500L && grown.indexType == "IVF_FLAT_CC")
    val probe = rest.limit(1).select(col("id").as("qid"), col("vec").as("qvec"))
    val top1 = grown.search(probe, 1, None).head()
    assert(top1.getLong(0) == top1.getLong(1)) // finds itself at distance 0
    // sparse kinds route to buildSparse with a clear message
    val e = intercept[IllegalArgumentException](
      IndexFactory.build(spark, "SPARSE_WAND_CC", base, Metric.IP))
    assert(e.getMessage.contains("buildSparse"))
  }

  test("MV search-info hints derive from the filter expression tree") {
    import graft.operators.MvSearchInfo
    import spark.implicits._
    val df = Seq((1, 2)).toDF("label", "cat")
    val a = MvSearchInfo.from(df, col("label") === 1 && col("cat").isin(2, 3, 4))
    assert(a.touchedFields == Map("label" -> 1L, "cat" -> 3L))
    assert(a.isPureAnd && !a.hasNot)
    val b = MvSearchInfo.from(df, col("label") === 1 || col("cat") === 2)
    assert(!b.isPureAnd)
    val c = MvSearchInfo.from(df, !(col("label") === 1))
    assert(c.hasNot && c.touchedFields == Map("label" -> 1L))
  }

  test("GetIndexMeta: JSON describe with per-list structure for IVF") {
    val flat = IndexFactory.build(spark, "FLAT", base, Metric.L2)
    val fm = flat.indexMetaJson
    assert(fm.contains("\"index_type\":\"FLAT\"") && fm.contains("\"count\":500"))
    val ivf = IndexFactory
      .build(spark, "IVF_FLAT", base, Metric.L2, nlist = 4, nprobe = 2)
      .asInstanceOf[IvfFlatIndex]
    val im = ivf.indexMetaJson
    assert(im.contains("\"nlist\":4") && im.contains("\"lists\":["))
    // valid JSON with list sizes summing to the count
    val sizes = "\"size\":(\\d+)".r.findAllMatchIn(im).map(_.group(1).toLong).sum
    assert(sizes == 500L)
  }

  test("factory rejects unsupported metric/index combinations") {
    assertThrows[IllegalArgumentException](
      IndexFactory.build(spark, "BIN_FLAT", base, Metric.L2))
    assertThrows[IllegalArgumentException](
      IndexFactory.build(spark, "NOT_AN_INDEX", base, Metric.L2))
  }

  test("static facade: resource estimates and config check without an instance") {
    assert(IndexStatic.estimateLoadResourceBytes("FLAT", 1000, 64) == 1000L * 64 * 4 + 8000L)
    assert(IndexStatic.estimateLoadResourceBytes("IVF_SQ8", 1000, 64) == 64000L + 8000L)
    // every registered CPU kind has an estimate (no throw across the enum)
    graft.operators.Capabilities.IndexTypes.foreach(t =>
      assert(IndexStatic.estimateLoadResourceBytes(t, 1000, 64) > 0L, t))
    // DiskANN's memory tier (codes only) is far below the raw FLAT bytes
    assert(IndexStatic.estimateLoadResourceBytes("DISKANN", 1000, 64) <
      IndexStatic.estimateLoadResourceBytes("FLAT", 1000, 64))
    // packed tiers store what they claim: fp16 halves the vector bytes,
    // int8 quarters them (ids unchanged)
    assert(IndexStatic.estimateLoadResourceBytes("FLAT", 1000, 64, "fp16")
      == 1000L * 64 * 2 + 8000L)
    assert(IndexStatic.estimateLoadResourceBytes("FLAT", 1000, 64, "int8")
      == 1000L * 64 * 1 + 8000L)
    assert(IndexStatic.estimateLoadResourceBytes("IVF_FLAT", 1000, 64, "bf16")
      < IndexStatic.estimateLoadResourceBytes("IVF_FLAT", 1000, 64))
    assert(IndexStatic.configCheck("FLAT", operators.Params.KnnParams(k = 10, metric = "cosine")))
    assert(!IndexStatic.configCheck("IVF_SQ8", operators.Params.KnnParams(k = 10, metric = "cosine")))
  }

  test("async build runs under a cancellable job group") {
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration._
    val h = AsyncBuild.run(spark, "flat-count") { base.count() }
    val n = scala.concurrent.Await.result(h.future, 60.seconds)
    assert(n == 500L)
    h.cancel() // no-op after completion; must not throw
  }

  test("AnnIterator session: cached pages match the recompute path; refine emits exact order") {
    import graft.operators.AnnIteratorOp
    val sess = AnnIteratorOp.open(queries, base, Metric.L2, Some(4))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("nid"), r.getAs[Int]("rnk"))).toSet
    val direct = BruteForce.annIteratorPage(queries, base, Metric.L2, page = 2,
      pageSize = 5, roundDist = Some(4))
    assert(rows(sess.page(2, 5)) == rows(direct))
    // refine with a beam that covers the whole page exactly reproduces knn
    val refined = sess.refinedPage(queries, base, p = 1, pageSize = 5,
      refineRatio = 4, Metric.L2, Some(4))
    val exact = BruteForce.knn(queries, base, 5, Metric.L2, roundDist = Some(4))
    assert(rows(refined) == rows(exact))
    sess.close()
  }

  test("lazy iterator pages (partial-sort-in-chunks) match the ranked session") {
    import graft.operators.AnnIteratorOp
    val eager = AnnIteratorOp.open(queries, base, Metric.L2, Some(4))
    val lazySess = AnnIteratorOp.openLazy(queries, base, Metric.L2, Some(4))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("nid"), r.getAs[Int]("rnk"))).toSet
    // the lazy page never ranks past p·pageSize, yet emits the same rows
    assert(rows(lazySess.page(1, 5)) == rows(eager.page(1, 5)))
    assert(rows(lazySess.page(3, 5)) == rows(eager.page(3, 5)))
    eager.close(); lazySess.close()
  }

  test("early-stop range search: same rows as the exhaustive scan, fewer pages") {
    import graft.operators.AnnIteratorOp
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("qid", "nid", "dist").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val exhaustive = BruteForce.rangeSearch(queries, base, Metric.L2,
      radius = 1.2, rangeFilter = 0.5, roundDist = Some(4))
    val early = AnnIteratorOp.rangeSearchEarlyStop(queries, base, Metric.L2,
      radius = 1.2, rangeFilter = 0.5, pageSize = 50, roundDist = Some(4))
    assert(rows(early) == rows(exhaustive))
    // tight radius: every query leaves the frontier long before the
    // stream is exhausted (base has 500 rows = 10 pages of 50)
    val fullPages = math.ceil(base.count().toDouble / 50).toInt
    assert(AnnIteratorOp.lastPagesTouched < fullPages,
      s"touched ${AnnIteratorOp.lastPagesTouched} of $fullPages pages")
    // huge radius degrades gracefully to the exhaustive answer
    val all = AnnIteratorOp.rangeSearchEarlyStop(queries, base, Metric.L2,
      radius = 1e9, rangeFilter = 0.0, pageSize = 200, roundDist = Some(4))
    assert(rows(all) == rows(BruteForce.rangeSearch(queries, base, Metric.L2,
      radius = 1e9, rangeFilter = 0.0, roundDist = Some(4))))
  }

  test("federOverview: JSON adjacency schema — level law, degree = parsed length, sorted ids") {
    val graph = BruteForce
      .knnFused(
        base.select(col("id").as("qid"), col("vec").as("qvec")),
        base, 4, Metric.L2, roundDist = Some(4), excludeSelf = true)
      .select(col("qid").as("src"), col("nid").as("dst"))
    val rows = GraphSearch.federOverview(graph).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nid = r.getAs[Long]("nid")
      val level = r.getAs[Int]("level")
      val degree = r.getAs[Int]("degree")
      val adj = r.getAs[String]("adj_json")
      // canonical JSON array of sorted neighbor ids
      assert(adj.startsWith("[") && adj.endsWith("]"), s"not a JSON array: $adj")
      val ids = adj.stripPrefix("[").stripSuffix("]") match {
        case "" => Array.empty[Long]
        case s => s.split(",").map(_.toLong)
      }
      assert(ids.length == degree, s"degree $degree != ${ids.length} for $nid")
      assert(ids.sorted.sameElements(ids), s"adjacency not sorted for $nid")
      // deterministic 4-adic layer law, capped at 8
      val expected = (1 to 8).foldLeft(0)((acc, l) =>
        if (nid % math.pow(4, l).toLong == 0) l else acc)
      assert(level == expected, s"level $level != $expected for $nid")
    }
  }

  test("annIteratorPage pages are disjoint and ordered") {
    val p1 = BruteForce.annIteratorPage(queries, base, Metric.L2, page = 1, pageSize = 5)
    val p2 = BruteForce.annIteratorPage(queries, base, Metric.L2, page = 2, pageSize = 5)
    val q0 = queries.head.getLong(0)
    val r1 = p1.filter(col("qid") === q0).orderBy("rnk").collect().map(_.getAs[Long]("nid"))
    val r2 = p2.filter(col("qid") === q0).orderBy("rnk").collect().map(_.getAs[Long]("nid"))
    assert(r1.length == 5 && r2.length == 5)
    assert(r1.toSet.intersect(r2.toSet).isEmpty)
    val full = BruteForce.knn(queries, base, 10, Metric.L2)
      .filter(col("qid") === q0).orderBy("rnk").collect().map(_.getAs[Long]("nid"))
    assert((r1 ++ r2).toSeq == full.toSeq)
  }
}
