package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators._
import graft.sources.Tables

/** Physical-plan shape gates: the scale claims (broadcast the small side,
  * shuffle once, push filters into the scan) asserted against the actual
  * executed plan, not just documented. */
class PlanSpec extends SparkSpec {

  private def plan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("star join broadcasts the 25-row dimension, never shuffles it") {
    val df = Tables
      .orders(spark, sf0001)
      .join(Tables.customer(spark, sf0001), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, sf0001)),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n"))
    val p = plan(df)
    assert(p.contains("BroadcastHashJoin"), s"no broadcast join in:\n$p")
    assert(!p.linesIterator.exists(l =>
      l.contains("Exchange hashpartitioning(n_nationkey")),
      "nation must not be shuffled")
  }

  test("brute-force knn: query side broadcast, exactly one shuffle (the top-k aggregate)") {
    val base = Tables.embeddings(spark, sf0001)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val queries = Tables.embeddings(spark, sf0001)
      .filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val p = plan(BruteForce.knn(queries, base, 5, Metric.L2, roundDist = Some(4)))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"query side not broadcast:\n$p")
    val shuffles = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(shuffles == 1, s"expected 1 shuffle (top-k agg), got $shuffles:\n$p")
  }

  test("packed kNN: same one-shuffle shape, packed kernel inside codegen") {
    import graft.functions.VectorFunctions.packFp16
    val base = Tables.embeddings(spark, sf0001)
      .select(col("vec_id").as("id"), packFp16(col("embedding")).as("vec"))
    val queries = Tables.embeddings(spark, sf0001)
      .filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("qid"), packFp16(col("embedding")).as("qvec"))
    val df = BruteForce.knnPacked(queries, base, 5, Metric.L2, bf16 = false,
      roundDist = Some(4))
    df.collect() // finalize the adaptive plan so codegen stages are visible
    // keep only the executed "== Final Plan ==" section (the string also
    // echoes the initial plan, which would double-count its Exchange)
    val p = plan(df).split("== Initial Plan ==").head
    assert(p.contains("BroadcastNestedLoopJoin"), s"query side not broadcast:\n$p")
    val shuffles = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(shuffles == 1, s"expected 1 shuffle (top-k agg), got $shuffles:\n$p")
    // the packed kernel must sit inside a whole-stage-codegen stage (the
    // `*(n)` marker on its Project), not fall back to interpreted eval
    val kernelLine = p.linesIterator.find(_.contains("vec_l2sq_fp16"))
    assert(kernelLine.isDefined, s"packed kernel missing from plan:\n$p")
    assert(kernelLine.get.contains("*("), s"packed kernel outside codegen:\n$p")
  }

  test("KnnJoin custom operator: plans to KnnJoinExec and equals BruteForce.knn") {
    val base = Tables.embeddings(spark, sf0001)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val queries = Tables.embeddings(spark, sf0001)
      .filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    def rows(df: DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    for (m <- Seq(Metric.L2, Metric.IP, Metric.Cosine)) {
      val custom = KnnJoin.knnJoin(queries, base, 5, m, roundDist = Some(4))
      // KnnJoinExec renders as node name "KnnJoin" (Exec suffix stripped);
      // no "!" prefix = no missing attributes in the physical plan
      assert(plan(custom).linesIterator.exists(l => l.contains("KnnJoin [")),
        s"custom node not planned by the strategy:\n${plan(custom)}")
      assert(!plan(custom).contains("!KnnJoin"),
        s"physical node reports missing attributes:\n${plan(custom)}")
      assert(rows(custom) == rows(BruteForce.knn(queries, base, 5, m, roundDist = Some(4))),
        s"metric ${m.name}")
    }
    // count()-shaped plans wrap the node in an empty projection — the
    // node's declared references must keep ColumnPruning off its children
    // (regression: pruned-to-zero-field child rows segfaulted positional
    // reads in the exec)
    assert(KnnJoin.knnJoin(queries, base, 5, Metric.L2, Some(4)).count() ==
      queries.count() * 5)
    // the SparkSessionExtensions installer registers the same strategy
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftSparkExtensionsImpl().apply(ext)
    assert(org.apache.spark.sql.GraftExpr.plannerStrategies(ext, spark)
      .contains(graft.plans.KnnJoinStrategy))
  }

  test("KnnJoin enforces the bounded query-side contract (oversized frame fails loudly)") {
    val base = Tables.embeddings(spark, sf0001)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val queries = Tables.embeddings(spark, sf0001)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    // a 4 KB budget fits ~14 dim-64 rows; the full query frame (500) must
    // be rejected BEFORE the driver materializes it
    val err = intercept[Exception] {
      KnnJoin.knnJoin(queries, base, 5, Metric.L2, Some(4),
        maxQueryBytes = 4L << 10).count()
    }
    assert(err.getMessage.contains("bounded-broadcast"),
      s"expected the contract error, got: ${err.getMessage}")
    // under the same budget a compliant query frame still answers
    val small = queries.filter(col("qid") % 100 === 0)
    assert(KnnJoin.knnJoin(small, base, 5, Metric.L2, Some(4),
      maxQueryBytes = 4L << 10).count() == small.count() * 5)
  }

  test("decontaminate: eval shingles broadcast; corpus never sort-merge-joined") {
    val docs = Tables.documents(spark, sf0001)
    val p = plan(Dedup.decontaminate(docs, col("doc_id") % 97 === 0))
    assert(p.contains("BroadcastHashJoin"), s"eval side not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"corpus must not pay a sort-merge join against the eval set:\n$p")
  }

  test("stratified quota sample: bounded-heap aggregate with map-side partial, no window sort") {
    val docs = Tables.documents(spark, sf0001)
    val df = Sampling.stratifiedQuota(docs, "source", quota = 5)
    val p = plan(df)
    // the per-stratum selection is the TopKAgg partial/final pair —
    // no global or per-partition Sort, no Window (the skew-prone shape)
    assert(p.contains("TopKAgg") || p.contains("ObjectHashAggregate"),
      s"expected the bounded-heap aggregate:\n$p")
    assert(!p.contains("Window"), s"must not use a window sort:\n$p")
    val shuffles = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(shuffles == 1, s"expected 1 shuffle (stratum agg), got $shuffles:\n$p")
  }

  test("LSH band join shuffles only (vec_id, band, key), never the embeddings") {
    val emb = Tables.embeddings(spark, sf0001)
    val proj = emb.filter(col("vec_id") < 16)
      .select(col("vec_id").cast("int").as("pid"), col("embedding").as("pvec"))
    val p = plan(Dedup.cosineLshPairs(emb, proj, threshold = 0.35))
    val bandShuffles = p.linesIterator.filter(l =>
      l.contains("Exchange hashpartitioning") && l.contains("key")).toSeq
    assert(bandShuffles.nonEmpty, s"no band-key shuffle found:\n$p")
    assert(!bandShuffles.exists(_.contains("embedding")),
      s"band shuffle must not carry embeddings:\n${bandShuffles.mkString("\n")}")
  }

  test("HLL sketch: map-side partial pair, one shuffle of fixed-size buffers") {
    val df = Tables.events(spark, sf0001)
      .groupBy(col("event_type"))
      .agg(round(graft.plans.HllAgg.hllDistinct(col("user_id")), 4).as("u"))
    val p = plan(df)
    // partial + final ObjectHashAggregate around exactly one exchange:
    // each map task ships one 256-byte register table per group, never
    // the distinct keys themselves
    assert(p.contains("hll_distinct"), s"hll aggregate missing:\n$p")
    assert(p.linesIterator.count(_.contains("ObjectHashAggregate")) == 2,
      s"expected partial+final object-hash aggregate:\n$p")
    val shuffles = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(shuffles == 1, s"expected 1 shuffle, got $shuffles:\n$p")
  }

  test("sequence packing: one shard shuffle, text pruned before it moves") {
    val df = Packing.packSequences(Tables.documents(spark, sf0001), budget = 512)
    val p = plan(df)
    val shuffles = p.linesIterator.filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(shuffles.size == 1, s"expected 1 shuffle (shard), got ${shuffles.size}:\n$p")
    // the cumsum window sorts within shards only — and the shuffled rows
    // carry (doc_id, n_tokens, h), never the document text
    assert(p.contains("Window"), s"expected the per-shard cumsum window:\n$p")
    assert(!shuffles.exists(_.contains("text")),
      s"shard shuffle must not carry text:\n${shuffles.mkString("\n")}")
  }

  test("packed IVF search: probed list ids prune the packed scan partitions") {
    import graft.functions.VectorFunctions.fp16Storage
    val base = Tables.embeddings(spark, sf0001)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val queries = Tables.embeddings(spark, sf0001)
      .filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("qid"), fp16Storage(col("embedding")).as("qvec"))
    val packed = IndexFactory.build(spark, "IVF_FLAT", base, Metric.L2,
      nlist = 4, nprobe = 2, roundDist = Some(4), elementType = "fp16")
      .asInstanceOf[PackedIvfIndex]
    val dir = java.nio.file.Files.createTempDirectory("graft-packed-prune").toString
    packed.save(dir) // partitionBy("cluster_id"), BINARY lists
    val loaded = IndexFactory.loadIvfPacked(spark, dir, Metric.L2, "fp16",
      nprobe = 2, roundDist = Some(4))
    val result = loaded.search(queries, 5, None)
    val p = plan(result)
    val listsScan = p.linesIterator
      .find(l => l.contains("FileScan") && l.contains("/lists_packed"))
      .getOrElse(fail(s"no lists_packed FileScan in plan:\n$p"))
    val pf = listsScan.substring(listsScan.indexOf("PartitionFilters"))
      .takeWhile(_ != ']') + "]"
    assert(pf.contains("cluster_id"), s"PartitionFilters should bind cluster_id: $listsScan")
    assert(!pf.replaceAll("\\s", "").contains("PartitionFilters:[]"),
      s"PartitionFilters must be non-empty: $listsScan")
    // pruning changed the plan, not the answer
    assert(result.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      == packed.search(queries, 5, None).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet)
  }

  test("grouped knn: bounded heap on (qid, group); the window sees only group bests") {
    val base = Tables.embeddings(spark, sf0001)
      .select(col("vec_id").as("id"), col("embedding").as("vec"), col("label"))
    val queries = Tables.embeddings(spark, sf0001)
      .filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val p = plan(GroupedSearch.knnGrouped(queries, base, k = 4, groupSize = 3,
      Metric.L2, roundDist = Some(4)))
    // the per-(qid,label) top-groupSize must ride the heap aggregate with a
    // map-side partial (the shuffle carries ≤ groupSize rows per group)...
    assert(p.contains("partial_topk_agg"), s"no map-side heap partial in:\n$p")
    // ...and the only Window is the group ranking over the heap's bounded
    // output — a row_number formulation over raw pairs would plan a second
    // Window and no heap aggregate
    assert(p.linesIterator.count(_.contains("Window [")) == 1,
      s"expected exactly one Window operator (group ranking):\n$p")
  }

  test("retrieveRerank: candidates broadcast into the base scan, one top-k shuffle") {
    val emb = Tables.embeddings(spark, sf0001)
    val queries = emb.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val base = emb.select(col("vec_id").as("id"), col("embedding").as("vec"))
    val cands = emb.filter(col("vec_id") % 5 === 0)
      .crossJoin(queries.select(col("qid")))
      .select(col("qid"), col("vec_id").as("nid"))
    val p = plan(Fusion.retrieveRerank(cands, queries, base, 5, Metric.Cosine,
      roundDist = Some(4)))
    assert(p.contains("BroadcastHashJoin"), s"candidates not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"base side must never sort-merge against candidates:\n$p")
  }

  test("budgetSelect: thresholds broadcast; no per-source window over the full corpus") {
    val docs = Tables.documents(spark, sf0001)
    val scored = docs
      .join(TextAnalysis.qualityScore(docs), "doc_id")
      .select(col("doc_id"), col("source"), col("n_chars"), col("quality"))
    val df = Sampling.budgetSelect(scored, budget = 3000L)
    val p = plan(df)
    assert(p.contains("BroadcastHashJoin"), s"threshold table not broadcast:\n$p")
    // the only Window allowed is the boundary-bucket cumsum, which sits
    // under a _q4 = threshold filter — assert the full-corpus branch
    // (the `>` side) carries no Window at all by checking the union's
    // first child… cheap proxy: exactly one Window in the whole plan
    assert(p.linesIterator.count(_.contains("Window [")) <= 1,
      s"more than one window (full-corpus sort leaked in):\n$p")
  }

  test("chunkOverlap is pure map-side: no shuffle, no window, one scan") {
    val df = Packing.chunkOverlap(Tables.documents(spark, sf0001), window = 32, stride = 24)
    val p = plan(df)
    assert(!p.contains("Exchange"), s"chunking must not shuffle:\n$p")
    assert(!p.contains("Window ["), s"chunking must not sort:\n$p")
  }

  test("sourceVocabOverlap: per-source sizes broadcast, self-join keyed on term") {
    val df = TextAnalysis.sourceVocabOverlap(Tables.documents(spark, sf0001))
    val p = plan(df)
    assert(p.contains("BroadcastHashJoin"), s"vocab sizes not broadcast:\n$p")
    // the big join must be an equi-join KEYED on term (hash-shuffled or,
    // at tiny SF, broadcast) — never an unkeyed cross product of the
    // vocabularies
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"vocab self-join not keyed on term:\n$p")
  }

  test("recallAtK: both bounded arms broadcast — no wide shuffle of results") {
    val embs = Tables.embeddings(spark, sf0001)
    val queries = embs.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val base = embs.select(col("vec_id").as("id"), col("embedding").as("vec"))
    val exact = BruteForce.knn(queries, base, 5, Metric.L2, roundDist = Some(4))
    val p = plan(Eval.recallAtK(exact, exact, 5))
    assert(p.contains("BroadcastHashJoin"), s"approx arm not broadcast:\n$p")
  }

  test("hardNegatives: queries broadcast, one top-k shuffle — label filter below the heap") {
    val embs = Tables.embeddings(spark, sf0001)
    val q = embs.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"),
        col("label").as("qlabel"))
    val base = embs.select(col("vec_id").as("id"), col("embedding").as("vec"), col("label"))
    val p = plan(Eval.hardNegatives(q, base, 5, Metric.L2, roundDist = Some(4)))
    assert(p.contains("BroadcastNestedLoopJoin"), s"query side not broadcast:\n$p")
    val shuffles = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(shuffles == 1, s"expected 1 shuffle (top-k agg), got $shuffles:\n$p")
  }

  test("rarityScore: text never crosses a shuffle; corpus total broadcast") {
    val p = plan(TextAnalysis.rarityScore(Tables.documents(spark, sf0001)))
    assert(!p.linesIterator.exists(l => l.contains("Exchange") && l.contains("text#")),
      s"text column crossed a shuffle:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"corpus total not broadcast:\n$p")
  }

  test("vocabCoverage: head list via bounded TakeOrdered + broadcast, no window") {
    val p = plan(TextAnalysis.vocabCoverage(Tables.documents(spark, sf0001), head = 10, mid = 20))
    assert(p.contains("TakeOrderedAndProject"), s"head list not a bounded top-N:\n$p")
    assert(!p.contains("Window"), s"unexpected window sort:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"head list not broadcast into tf:\n$p")
  }

  test("nucleusVocab: running sum windows only the per-count buckets, not the vocab") {
    val docs = Tables.documents(spark, sf0001)
    val df = TextAnalysis.nucleusVocab(docs, targetsBp = Seq(5000, 9000))
    val p = plan(df)
    // the Window must consume the (cnt, n_terms) bucket aggregate, i.e.
    // sit ABOVE two HashAggregates (term count, then count buckets)
    val wIdx = p.linesIterator.indexWhere(_.contains("Window"))
    assert(wIdx >= 0, s"no running-sum window found:\n$p")
    val below = p.linesIterator.toSeq.drop(wIdx)
    assert(below.count(_.contains("HashAggregate")) >= 2,
      s"window does not sit above the bucket roll-up:\n$p")
  }

  test("incrementalFlags: key-only semi-joins; text never crosses a shuffle") {
    val docs = Tables.documents(spark, sf0001)
    val piv = docs.agg(expr("CAST((max(doc_id) + 1) DIV 2 AS BIGINT)").as("p"))
    val withP = docs.crossJoin(broadcast(piv))
    val df = Dedup.incrementalFlags(
      withP.filter(col("doc_id") < col("p")).drop("p"),
      withP.filter(col("doc_id") >= col("p")).drop("p"))
    val p = plan(df)
    assert(p.contains("LeftSemi"), s"no semi-join against history keys:\n$p")
    assert(!p.linesIterator.exists(l => l.contains("Exchange") && l.contains("text#")),
      s"text column crossed a shuffle:\n$p")
  }

  test("semanticDedup: centroids broadcast for assignment; pair join keyed on cluster") {
    val emb = Tables.embeddings(spark, sf0001).select(col("vec_id"), col("embedding"))
    val cents = Tables.embeddings(spark, sf0001)
      .filter(col("vec_id") % 250 === 0)
      .select(col("vec_id").as("cluster_id"), col("embedding").as("centroid"))
    val df = Dedup.semanticDedup(emb, cents, threshold = 0.35)
    df.collect() // materialize (operator persists + finalizes AQE)
    val p = plan(df)
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"centroids not broadcast:\n$p")
  }

  test("pmiBigrams: bounded TakeOrdered top-k, no global window, text stays behind the tokenizer") {
    val p = plan(TextAnalysis.pmiBigrams(Tables.documents(spark, sf0001)))
    assert(p.contains("TakeOrderedAndProject"), s"top-k not a bounded TakeOrdered:\n$p")
    assert(!p.contains("Window"), s"unexpected global window:\n$p")
    assert(!p.linesIterator.exists(l => l.contains("Exchange") && l.contains("text#")),
      s"text column crossed a shuffle:\n$p")
  }

  test("ndcgAtK / mrrAtK: bounded arms broadcast like recallAtK") {
    val embs = Tables.embeddings(spark, sf0001)
    val queries = embs.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val base = embs.select(col("vec_id").as("id"), col("embedding").as("vec"))
    val exact = BruteForce.knn(queries, base, 5, Metric.L2, roundDist = Some(4))
    val pN = plan(Eval.ndcgAtK(exact, exact, 5))
    assert(pN.contains("BroadcastHashJoin"), s"ndcg arms not broadcast:\n$pN")
    val pM = plan(Eval.mrrAtK(exact, exact))
    assert(pM.contains("BroadcastHashJoin"), s"mrr arms not broadcast:\n$pM")
  }

  test("KnnWindowRewrite: naive window-top-k plans to KnnJoinExec, equal answers") {
    import org.apache.spark.sql.expressions.{Window => W}
    import graft.functions.VectorFunctions.l2
    graft.operators.KnnJoin.register(spark)
    val emb = Tables.embeddings(spark, sf0001)
    val q = emb.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val b = emb.select(col("vec_id").as("id"), col("embedding").as("vec"))
    def naive = q.crossJoin(b)
      .select(col("qid"), col("id").as("nid"), round(l2(col("qvec"), col("vec")), 4).as("dist"))
      .withColumn("rnk", row_number().over(
        W.partitionBy(col("qid")).orderBy(col("dist").asc, col("nid").asc)))
      .filter(col("rnk") <= 10)
    val p = plan(naive)
    assert(p.contains("KnnJoin"), s"naive window-top-k not rewritten:\n$p")
    val ref = BruteForce.knn(q, b, 10, Metric.L2, roundDist = Some(4))
    assert(naive.exceptAll(ref).isEmpty && ref.exceptAll(naive).isEmpty)
    // IP arm: similarity metrics order DESC — also rewritten
    import graft.functions.VectorFunctions.{dot => dotF}
    val ipNaive = q.crossJoin(b)
      .select(col("qid"), col("id").as("nid"), round(dotF(col("qvec"), col("vec")), 4).as("dist"))
      .withColumn("rnk", row_number().over(
        W.partitionBy(col("qid")).orderBy(col("dist").desc, col("nid").asc)))
      .filter(col("rnk") <= 10)
    assert(plan(ipNaive).contains("KnnJoin"), "ip desc formulation not rewritten")
    val ipRef = BruteForce.knn(q, b, 10, Metric.IP, roundDist = Some(4))
    assert(ipNaive.exceptAll(ipRef).isEmpty && ipRef.exceptAll(ipNaive).isEmpty)
    // conservative matching: a non-standard tie-break must NOT rewrite
    val odd = q.crossJoin(b)
      .select(col("qid"), col("id").as("nid"), round(l2(col("qvec"), col("vec")), 4).as("dist"))
      .withColumn("rnk", row_number().over(
        W.partitionBy(col("qid")).orderBy(col("dist").asc, col("nid").desc)))
      .filter(col("rnk") <= 10)
    assert(!plan(odd).contains("KnnJoin"), "non-standard tie-break must not rewrite")
  }

  test("knnClassify: neighbor labels broadcast onto the bounded kNN arm") {
    val embs = Tables.embeddings(spark, sf0001)
    val queries = embs.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val base = embs.select(col("vec_id").as("id"), col("embedding").as("vec"), col("label"))
    val p = plan(Eval.knnClassify(queries, base, 5, Metric.L2, Some(4)))
    assert(p.contains("BroadcastHashJoin"), s"label join not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"sort-merge join crept in:\n$p")
  }

  test("dimStats: map-side partial aggregate before the tiny dim-keyed shuffle") {
    val p = plan(Eval.dimStats(Tables.embeddings(spark, sf0001)))
    val shuffles = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(shuffles == 1, s"expected 1 shuffle (dim groupBy), got $shuffles:\n$p")
    assert(p.contains("partial"), s"no map-side partial aggregation:\n$p")
  }

  test("shuffleRank: per-bucket sorts, offsets broadcast, no global single-partition sort") {
    val p = plan(Sampling.shuffleRank(Tables.documents(spark, sf0001), buckets = 8))
    assert(p.contains("BroadcastHashJoin"), s"offset join not broadcast:\n$p")
    assert(!p.linesIterator.exists(l => l.contains("Exchange rangepartitioning")),
      s"global range sort crept in (single-reducer hazard):\n$p")
  }

  test("funnel: every shuffle lands on the user key — no event-wide exchange") {
    val p = plan(Funnel.steps(Tables.events(spark, sf0001), Seq("view", "click", "purchase")))
    assert(!p.contains("SortMergeJoin") || p.contains("BroadcastHashJoin"),
      s"funnel joins neither broadcast nor co-keyed:\n$p")
    assert(!p.linesIterator.exists(l => l.contains("Exchange hashpartitioning(event_id")),
      s"shuffle on event_id (should key on user_id):\n$p")
  }

  test("keepBestInGroup: survivor table broadcast back, no per-group window") {
    import spark.implicits._
    val groups = Seq((1L, 1L), (2L, 1L)).toDF("doc_id", "group_id")
    val quality = Seq((1L, 10L), (2L, 30L)).toDF("doc_id", "q")
    val p = plan(Dedup.keepBestInGroup(groups, quality))
    assert(p.contains("BroadcastHashJoin"), s"survivor join not broadcast:\n$p")
    assert(!p.contains("Window"), s"window sneaked into survivor selection:\n$p")
  }

  test("tokenFertility: one partial-aggregated source exchange — a pure scan otherwise") {
    val p = plan(TextAnalysis.tokenFertility(Tables.documents(spark, sf0001)))
    val shuffles = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(shuffles == 1, s"expected exactly 1 shuffle (source agg), got $shuffles:\n$p")
    assert(!p.contains("Join"), s"fertility must not join:\n$p")
  }

  test("timeToConvert family shape: event_type filters pushed into the scan") {
    val ev = Tables.events(spark, sf0001)
    val v0 = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(unix_micros(col("ts"))).as("v0"))
    val df = v0.join(
      ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), unix_micros(col("ts")).as("pt")),
      "user_id")
    assert(plan(df).contains("EqualTo(event_type,view)"),
      s"view filter not pushed:\n${plan(df)}")
    assert(plan(df).contains("EqualTo(event_type,purchase)"),
      s"purchase filter not pushed:\n${plan(df)}")
  }

  test("GridKMeans search: probes broadcast onto the assignment scan — no sort-merge join") {
    val queries = Tables.embeddings(spark, sf0001)
      .filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val baseV = Tables.embeddings(spark, sf0001)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val cents = GridKMeans.train(baseV, stride = 250L, iters = 1)
    val df = GridKMeans.search(queries, baseV, cents, k = 5, nprobe = 2)
    df.collect()
    val p = plan(df).split("== Initial Plan ==").head
    assert(p.contains("BroadcastHashJoin"), s"probe frame not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"candidate join fell back to sort-merge (base would shuffle):\n$p")
  }

  test("containmentPairs: candidate pipeline evaluated once — one band join, not one per direction") {
    val docs = Tables.documents(spark, sf0001)
    val out = Dedup.containmentPairs(docs, threshold = 0.5)
    // the operator returns an eagerly-cached frame; the plan that matters
    // is the one it cached
    val cached = out.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.columnar.InMemoryRelation =>
        r.cachedPlan.toString
    }
    assert(cached.nonEmpty, "containment output should be eagerly cached")
    // keep only the executed section (the AQE string echoes the initial
    // plan, which would double-count every join)
    val p = cached.head.split("== Initial Plan ==").head
    // band self-join + two shingle re-joins = 3 join nodes; the round-5
    // union-of-filtered-branches plan carried every join twice
    val joins = p.linesIterator.count(l =>
      l.contains("SortMergeJoin") || l.contains("ShuffledHashJoin") ||
        l.contains("BroadcastHashJoin"))
    assert(joins <= 3, s"candidate pipeline evaluated more than once ($joins joins):\n$p")
    assert(p.contains("Generate explode"), s"expected single-pass directed explode:\n$p")
    out.unpersist()
  }

  test("maxTokenRun / winnowing: pure map-side scans — no exchange at all") {
    val docs = Tables.documents(spark, sf0001)
    val p1 = plan(TextAnalysis.maxTokenRun(docs))
    assert(!p1.contains("Exchange"), s"maxTokenRun shuffled:\n$p1")
    val p2 = plan(TextAnalysis.winnowingFingerprints(docs))
    assert(!p2.contains("Exchange"), s"winnowing shuffled:\n$p2")
  }

  test("retention: shuffles key on user/cohort only; window rides the tiny aggregate") {
    val df = Cohort.retention(Tables.events(spark, sf0001))
    val p = plan(df)
    assert(!p.linesIterator.exists(l => l.contains("Exchange hashpartitioning(event_id")),
      s"shuffle on event_id (should key on user/cohort):\n$p")
    // the one Window runs over the (cohort, offset) AGGREGATE — its input
    // must be the aggregated frame, never the event scan
    val lines = p.linesIterator.toSeq
    val wIdx = lines.indexWhere(_.contains("Window"))
    assert(wIdx >= 0, s"cohort-size carry window missing:\n$p")
    assert(lines.drop(wIdx).exists(_.contains("HashAggregate")),
      s"window does not sit above the aggregate:\n$p")
  }

  test("first-touch attribution: one row per user rides the join — no window") {
    val p = plan(Cohort.attribution(
      Tables.events(spark, sf0001), "purchase", Seq("view", "click"), first = true))
    assert(!p.contains("Window"), s"window in the first-touch arm:\n$p")
  }

  test("rollup: one Expand feeds a single partial-aggregated exchange") {
    val df = Tables.orders(spark, sf0001)
      .join(Tables.customer(spark, sf0001), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, sf0001)), col("c_nationkey") === col("n_nationkey"))
      .rollup(col("n_name"))
      .agg(count(lit(1)).as("n"))
    val p = plan(df)
    assert(p.contains("Expand"), s"rollup lost its Expand (grouping sets):\n$p")
    val aggExchanges = p.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning(n_name"))
    assert(aggExchanges <= 1, s"rollup paid $aggExchanges aggregate exchanges:\n$p")
  }

  test("maxSim: query bag broadcast into one scan; no sort-merge join") {
    val emb = Tables.embeddings(spark, sf0001)
    val qv = emb.filter(col("vec_id") % 50 === 0)
      .select((col("vec_id") / 100).cast("long").as("qid"),
        col("vec_id").as("qvec_id"), col("embedding").as("qvec"))
    val bv = emb.select((col("vec_id") / 4).cast("long").as("did"),
      col("vec_id").as("bvec_id"), col("embedding").as("vec"))
    val p = plan(MultiVector.maxSimKnn(qv, bv, 5))
    assert(p.contains("BroadcastNestedLoopJoin"), s"query bag not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"sort-merge crept into maxSim:\n$p")
    // both aggregations carry map-side partials
    assert(p.linesIterator.count(_.contains("partial")) >= 2,
      s"missing map-side partial aggregation:\n$p")
  }

  test("salted join: build side replicated, exchange keyed on (key, salt)") {
    val ev = Tables.events(spark, sf0001)
    val dim = ev.groupBy(col("user_id")).agg(count(lit(1)).as("user_total"))
    val p = plan(Skew.saltedJoin(
      ev.select(col("event_id"), col("user_id")), dim, "user_id",
      discriminator = col("event_id"), salts = 8))
    // the join key must widen to include the salt — that IS the skew fix
    assert(p.linesIterator.exists(l =>
      l.contains("hashpartitioning(user_id") && l.contains("_salt") ||
        l.contains("[user_id") && l.contains("_salt")),
      s"join not keyed on (user_id, _salt):\n$p")
    assert(p.contains("Generate explode") || p.contains("Expand") || p.contains("explode"),
      s"build side not replicated per salt:\n$p")
  }

  test("sharded scatter-gather: queries broadcast; scatter keyed (qid, shard), gather keyed qid") {
    val base = Tables.embeddings(spark, sf0001)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val queries = Tables.embeddings(spark, sf0001)
      .filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val sharded = base.withColumn("shard", pmod(col("id"), lit(4L)).cast("int"))
    val p = plan(ShardedServe.scatterGather(queries, sharded, 5, Metric.L2, Some(4)))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"query side not broadcast:\n$p")
    // the scatter heap partial-aggregates per (qid, shard) BEFORE its
    // exchange — at most k rows per group cross the wire per partition —
    // and the gather heap re-keys on qid alone
    assert(p.linesIterator.exists(l => l.contains("Exchange hashpartitioning(qid#")
      && l.contains(", shard#")), s"no (qid, shard) scatter exchange:\n$p")
    val qidOnly = p.linesIterator.exists { l =>
      l.contains("Exchange hashpartitioning(qid#") && !l.contains(", shard#")
    }
    assert(qidOnly, s"no qid-only gather exchange:\n$p")
    // exactly the two heap shuffles — nothing else moves data
    val shuffles = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(shuffles == 2, s"expected 2 shuffles (scatter + gather), got $shuffles:\n$p")
  }

  test("apAtK / cohenKappa: bounded frames broadcast; kappa is one tiny aggregate chain") {
    val emb = Tables.embeddings(spark, sf0001)
    val q = emb.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val b = emb.select(col("vec_id").as("id"), col("embedding").as("vec"))
    val exact = BruteForce.knn(q, b, 5, Metric.L2, roundDist = Some(4))
    val p = plan(Eval.apAtK(exact, exact, 5))
    assert(p.contains("BroadcastHashJoin"), s"bounded arm not broadcast:\n$p")
    val docs = Tables.documents(spark, sf0001)
    val pairs = docs.join(TextAnalysis.langId(docs), "doc_id")
      .select(col("lang"), col("pred_lang"))
    val pk = plan(Eval.cohenKappa(pairs, "lang", "pred_lang"))
    assert(!pk.contains("SortMergeJoin"),
      s"kappa's tiny marginal join should never sort-merge:\n$pk")
  }

  test("PqEncode native kernel is bit-identical to the relational argmin formulation") {
    // the formulation PqEncode replaced (array_position over an array of
    // m·ksub VecL2Sq nodes) — kept here as the cross-check reference; it
    // pins first-minimum tie-breaks and the min-length slice rule
    import graft.functions.VectorFunctions
    def relationalEncode(vec: org.apache.spark.sql.Column,
        model: ProductQuant.PQModel): org.apache.spark.sql.Column = {
      val codeCols = (0 until model.m).map { s =>
        val sub = slice(vec, s * model.dsub + 1, model.dsub)
        val dists = array((0 until model.ksub).map(c =>
          VectorFunctions.l2Sq(sub, typedlit(model.codebooks(s)(c).toSeq))): _*)
        (array_position(dists, array_min(dists)) - 1L).cast("int")
      }
      array(codeCols: _*)
    }
    val base = Tables.embeddings(spark, sf0001)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    // explicit codebooks straight from base rows ⇒ exact-tie codewords
    // exist (a vector IS its own codeword slice), exercising the
    // first-minimum rule; ksub=25 exceeds any historical small-ksub path
    val model = ProductQuant.explicitModel(base, m = 8, ksub = 25, step = 17)
    val got = base.select(col("id"),
      ProductQuant.encodeExpr(col("vec"), model).as("codes"))
    val want = base.select(col("id"), relationalEncode(col("vec"), model).as("codes"))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "native PqEncode diverged from the relational argmin")
    // and the whole-stage-codegen path actually runs it (no fallback):
    // the executed plan's Project carrying pq_encode must sit inside a
    // codegen stage (the `*(n)` marker)
    val p = plan(got)
    assert(p.linesIterator.exists(l => l.contains("pq_encode") && l.trim.startsWith("*(")),
      s"PqEncode fell out of codegen:\n$p")
  }
}
