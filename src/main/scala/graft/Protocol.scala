package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators._

/** The reference's QPS protocol point
  * (`benchmark/hdf5/benchmark_float_qps.cpp:55-100,365-414`): nb=1M,
  * dim=128, recall@100 targets {0.80, 0.95} — binary-search each family's
  * query-time knob (nprobe for IVF, ef for the graph walk, itopk for
  * CAGRA, search_list_size L for DiskANN) to the SMALLEST value reaching
  * the target, then report serving QPS at the tuned knob. Single-thread
  * sequential serving loops after an untimed warm-up pass (the JIT
  * contract every Scale latency number follows).
  *
  * Usage: runMain graft.Protocol [nb] [nq] [dim] [k] [noise] [families]
  * (defaults 1000000 100 128 100 0.7 all — the published protocol
  * scale; `families` is a csv subset of
  * ivf,ivf_pq,scann,graph,diskann,cagra,filtered for re-running one
  * phase without repaying the others' builds).
  *
  * Round-12 breadth, tracking the reference's full harness:
  *  - client-thread QPS sweep t ∈ {1,2,4,8}
  *    (`benchmark_float_qps.cpp:27-46,394` THREAD_NUMs_) on every
  *    reached target — the searchers are consulted concurrently, the
  *    same contract the shard routers already exercise;
  *  - IVF_PQ arm, m ∈ {8,16,32} at nbits=8 (`benchmark_float_qps.cpp:
  *    400-401`) and SCANN arm, reorder_k ∈ {256,512,1024} (`:408-409`),
  *    both over the repo's coded-IVF serving tier;
  *  - bitset-filtered QPS at filtered-out ratios {0.5, 0.9, 0.93, 0.97}
  *    (`benchmark_float_bitset.cpp`), with the adaptive-fallback
  *    decision (`IndexConditionalWrapper.h:27-29`) reported and the
  *    ≥0.93 brute-force fallback measured as the reference takes it.
  */
object Protocol {
  def main(args: Array[String]): Unit = {
    val nb = if (args.length > 0) args(0).toInt else 1000000
    val nq = if (args.length > 1) args(1).toInt else 100
    val dim = if (args.length > 2) args(2).toInt else 128
    val k = if (args.length > 3) args(3).toInt else 100
    // cluster-noise amplitude: Scale's 0.15 makes clusters so separated
    // that every neighbor list sits inside one IVF cell and nprobe=1 is
    // already exact — a DEGENERATE sweep (and at dim 128 distance
    // concentration keeps it degenerate even at fairly wide noise).
    // 0.7 ≈ 2:1 center/noise variance per dim — measured nontrivial
    // knob curves with the 0.95 target REACHABLE, the regime the
    // published protocol measures on SIFT-like sets; 1.0 measured
    // near-uniform (nprobe 197/1024 for recall 0.80, 0.95 out of reach
    // for every family — the known high-dim concentration wall, not a
    // useful tuning surface)
    val noise = if (args.length > 4) args(4).toDouble else 0.7d
    val families: Set[String] =
      if (args.length > 5) args(5).split(",").map(_.trim).toSet
      else Set("ivf", "ivf_pq", "scann", "graph", "diskann", "cagra", "filtered", "range")
    // latent-center count: sized so a cluster holds ~k/2 points — with
    // k=100 and ~50 points per center, a query's true top-k MUST span
    // several nearby clusters (and hence several IVF cells / graph
    // regions), which is what makes the recall-vs-knob curve the
    // nontrivial shape the published protocol measures on real sets;
    // Scale's fixed 1000 centers put whole neighbor lists in one cell
    val centers = math.max(1000, nb / math.max(1, k / 2))
    val targets = Seq(0.80, 0.95)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      // graph builds at nb=1M shuffle multi-billion-row detour frames: at
      // `cpus` initial partitions each sort task holds GBs and spills the
      // disk dry. AQE starts wide and coalesces the small stages back down
      // — the 1000-executor sizing rule applied to the local harness.
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", "256")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SessionTuning.install(spark)

    // the Scale generator: clustered data (1000 latent centers + noise) —
    // uniform random is the ANN worst case and measures nothing real
    def gen(n: Int, idCol: String, vecCol: String): DataFrame = {
      def u(seedCol: org.apache.spark.sql.Column, i: org.apache.spark.sql.Column) =
        (pmod(xxhash64(seedCol * 1000 + i), lit(2000)).cast("double") - 1000d) / 1000d
      spark.range(n.toLong).toDF(idCol)
        .withColumn("_c", pmod(xxhash64(col(idCol)), lit(centers)))
        .withColumn(vecCol, transform(sequence(lit(1), lit(dim)),
          i => (u(col("_c") + 7777777L, i) + u(col(idCol), i) * noise).cast("float")))
        .drop("_c")
    }
    val base = gen(nb, "id", "vec").persist()
    val queries = gen(nq, "qid", "qvec").persist()
    println(s"protocol: nb=${base.count()} dim=$dim nq=${queries.count()} k=$k " +
      s"noise=$noise centers=$centers")

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    // ---- ground truth: exact top-k over the full corpus ----
    val truth: Map[Long, Set[Long]] = time(s"ground truth (exact top-$k)")(
      BruteForce.knnFused(queries, base, k, Metric.L2, roundDist = Some(4))
        .select("qid", "nid").collect()
        .groupBy(_.getLong(0)).map { case (q, rows) => q -> rows.map(_.getLong(1)).toSet })
    val qv = queries.collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))

    def recallOf(sub: Seq[(Long, Array[Float])])(search: Array[Float] => Seq[Long]): Double = {
      var hits = 0L
      sub.foreach { case (qid, v) => hits += search(v).count(truth(qid).contains) }
      hits.toDouble / (sub.length.toLong * k)
    }

    // ---- range-search protocol point (`benchmark_float_range.cpp`):
    // the reference publishes range QPS alongside knn QPS — radius here
    // is the MEDIAN exact kth-NN distance over the query set, so each
    // query's in-radius set averages ≈ k rows (the selectivity its
    // per-dataset radius encodes); range recall = Σhits / Σ|truth|. ----
    val (rangeRadius, truthRange): (Double, Map[Long, Set[Long]]) =
      if (!families("range")) (0.0, Map.empty)
      else {
        val kth = time("range radius (exact kth-NN distances)")(
          BruteForce.knnFused(queries, base, k, Metric.L2, roundDist = Some(4))
            .groupBy(col("qid")).agg(max(col("dist")).as("dk"))
            .collect().map(_.getDouble(1)).sorted)
        val radius = kth(kth.length / 2)
        val tr = time(f"range ground truth (radius=$radius%.4f)")(
          BruteForce.rangeSearch(queries, base, Metric.L2, radius, 0.0,
            roundDist = Some(4))
            .select("qid", "nid").collect()
            .groupBy(_.getLong(0)).map { case (q, rows) => q -> rows.map(_.getLong(1)).toSet })
        val avg = tr.values.map(_.size).sum.toDouble / math.max(1, tr.size)
        println(f"range: radius=$radius%.4f avg in-radius rows/query=$avg%.1f")
        (radius, tr)
      }
    def recallRange(search: Array[Float] => Seq[Long]): Double = {
      var hits = 0L
      var denom = 0L
      qv.foreach { case (qid, v) =>
        val tr = truthRange.getOrElse(qid, Set.empty)
        denom += tr.size
        hits += search(v).count(tr.contains)
      }
      hits.toDouble / math.max(1L, denom)
    }
    def reportRange(family: String, knobName: String, knob: Int,
        recall: Double, q: Double): Unit =
      println(f"PROTOCOL_RANGE family=$family radius=$rangeRadius%.4f " +
        f"$knobName=$knob range_recall=$recall%.3f qps=$q%.1f (single-thread serving)")

    /** The reference's knob search (`benchmark_float_qps.cpp:365-414`):
      * smallest knob in [lo, hi] whose recall reaches `target` (recall is
      * monotone in every knob swept here); reports the hi-end recall when
      * the target is unreachable, rather than guessing. */
    def tune(lo: Int, hi: Int, target: Double)(recallAt: Int => Double): (Int, Double) = {
      var l = lo
      var h = hi
      val topR = recallAt(hi)
      if (topR < target) return (hi, topR)
      var best = (hi, topR)
      while (l < h) {
        val mid = l + (h - l) / 2
        val r = recallAt(mid)
        if (r >= target) { best = (mid, r); h = mid }
        else l = mid + 1
      }
      best
    }

    def qps(search: Array[Float] => Unit): Double = {
      qv.foreach { case (_, v) => search(v) } // untimed warm-up (JIT)
      val t0 = System.nanoTime()
      qv.foreach { case (_, v) => search(v) }
      qv.length.toDouble / ((System.nanoTime() - t0) / 1e9)
    }

    // the reference's client-thread sweep (`benchmark_float_qps.cpp:27-46`
    // THREAD_NUMs_ ∈ {1,2,4,8}, `:394`): a fixed pool splits the query set
    // across t clients; the searchers are read-only after load and are the
    // same objects the shard routers already consult concurrently. Three
    // passes of the full set per measurement so per-thread work stays off
    // the timer-resolution floor at nq=100.
    val threadCounts: Seq[Int] = sys.env.getOrElse("GRAFT_THREADS", "1,2,4,8")
      .split(",").map(_.trim.toInt).toSeq
    def qpsThreads(t: Int)(search: Array[Float] => Unit): Double = {
      qv.foreach { case (_, v) => search(v) } // untimed warm-up (JIT)
      val reps = 3
      val work = Seq.fill(reps)(qv).flatten
      val chunks = work.zipWithIndex.groupBy(_._2 % t).values.map(_.map(_._1)).toSeq
      val pool = java.util.concurrent.Executors.newFixedThreadPool(t)
      val t0 = System.nanoTime()
      val fs = chunks.map(c => pool.submit(new Runnable {
        def run(): Unit = c.foreach { case (_, v) => search(v) }
      }))
      fs.foreach(_.get())
      val dt = (System.nanoTime() - t0) / 1e9
      pool.shutdown()
      work.length.toDouble / dt
    }

    def reportThreads(family: String, knobName: String, knob: Int)(
        search: Array[Float] => Unit): Unit = {
      val cols = threadCounts
        .map(t => f"t$t=${qpsThreads(t)(search)}%.1f")
        .mkString(" ")
      println(s"PROTOCOL_THREADS family=$family $knobName=$knob qps[$cols]")
    }

    def report(family: String, knobName: String, knob: Int, recall: Double, q: Double): Unit =
      println(f"PROTOCOL family=$family target_knob $knobName=$knob " +
        f"recall@$k=$recall%.3f qps=$q%.1f (single-thread serving)")

    // ---- IVF_FLAT: knob = nprobe in [1, nlist] — the full legal range
    // (the reference sweeps PARAMS_RANGE up to its nprobe ceiling and
    // clamps at nlist; capping below nlist mislabels reachable targets
    // "UNREACHED", as the r10 run did at 256/1024 → 0.912) ----
    val needIvfIndex =
      families("ivf") || families("ivf_pq") || families("scann") ||
        families("filtered") || families("range")
    if (needIvfIndex) {
      val nlist = 1024
      val cents = time(s"ivf train (kmeans, nlist=$nlist)")(
        IvfIndex.trainKMeans(spark, base.sample(0.05, 42), nlist))
      val index = time("ivf build (assign)")(IvfIndex.build(base, cents).persist())
      index.count()
      if (families("ivf") || families("filtered")) {
        val s = time("serve load (IVF fp32 lists)")(Serve.loadIvf(index, cents, Metric.L2))
        var knob80 = nlist
        if (families("ivf")) targets.foreach { t =>
          val (knob, rec) = tune(1, nlist, t)(np =>
            recallOf(qv)(v => s.search(v, k, np).map(_._1)))
          val q = qps(v => s.search(v, k, knob))
          report("ivf_flat", "nprobe", knob, rec, q)
          if (t == 0.80 && rec >= t) knob80 = knob
          if (rec >= t) reportThreads("ivf_flat", "nprobe", knob)(v => s.search(v, k, knob))
        }

        // ---- bitset-filtered QPS (`benchmark_float_bitset.cpp`): the
        // filter is id-keyed (ids are uncorrelated with vectors here —
        // cluster assignment hashes the id), recall is vs the FILTERED
        // exact top-k, and the adaptive decision + nprobe scaling
        // (`IndexConditionalWrapper.h:27-29`, `ivf.cc:750-760`) are
        // reported and taken: at filtered-out ≥ 0.93 the reference scans
        // the survivors linearly — measured here as the nprobe=nlist
        // full-probe scan, which IS that linear scan over survivors. ----
        if (families("filtered")) {
          Seq(0.50, 0.90, 0.93, 0.97).foreach { ratio =>
            val allowedPct = math.round((1.0 - ratio) * 100).toInt
            val pred: Long => Boolean = id => id % 100 < allowedPct
            val truthF: Map[Long, Set[Long]] =
              time(f"filtered ground truth (ratio=$ratio%.2f)")(
                BruteForce.knnFused(queries,
                  base.filter(col("id") % 100 < allowedPct), k, Metric.L2,
                  roundDist = Some(4))
                  .select("qid", "nid").collect()
                  .groupBy(_.getLong(0))
                  .map { case (q, rows) => q -> rows.map(_.getLong(1)).toSet })
            def recallF(search: Array[Float] => Seq[Long]): Double = {
              var hits = 0L
              var denom = 0L
              qv.foreach { case (qid, v) =>
                val t = truthF.getOrElse(qid, Set.empty)
                denom += t.size
                hits += search(v).count(t.contains)
              }
              hits.toDouble / math.max(1L, denom)
            }
            val surviving = nb.toLong * allowedPct / 100
            val decision = AdaptiveSearch.choose(k, nb.toLong, surviving)
            val np = AdaptiveSearch.scaledNprobe(knob80, nlist, nb.toLong, surviving)
            val effNp = if (decision == "bf") nlist else np
            val rec = recallF(v => s.search(v, k, effNp, pred).map(_._1))
            val q = qps(v => s.search(v, k, effNp, pred))
            println(f"PROTOCOL_FILTERED family=ivf_flat ratio=$ratio%.2f " +
              f"decision=$decision nprobe=$effNp (scaled from $knob80) " +
              f"recall@$k=$rec%.3f qps=$q%.1f")
          }
        }
      }

      // IVF_SQ8 (codes resident, sector-paged raw rerank):
      // knob = nprobe at reorder_k = 3k
      if (families("ivf")) {
        val st = Quantization.sq8Train(base)
        val s = time("serve load (IVF_SQ8 codes + sector store)")(
          Serve.loadIvfSq8(index, cents, Some(st)))
        val reorderK = 3 * k
        targets.foreach { t =>
          val (knob, rec) = tune(1, nlist, t)(np =>
            recallOf(qv)(v => s.search(v, k, np, reorderK).map(_._1)))
          val q = qps(v => s.search(v, k, knob, reorderK))
          report("ivf_sq8", "nprobe", knob, rec, q)
          if (rec >= t)
            reportThreads("ivf_sq8", "nprobe", knob)(v => s.search(v, k, knob, reorderK))
        }
      }

      // ---- IVF_PQ: the reference sweeps m ∈ {8,16,32} at nbits=8
      // (`benchmark_float_qps.cpp:400-401`); knob = nprobe at
      // reorder_k = 3k over the coded tier + sector-paged exact rerank ----
      if (families("ivf_pq")) {
        Seq(8, 16, 32).foreach { m =>
          val pq = time(s"ivf_pq train (m=$m, ksub=256)")(
            ProductQuant.train(spark, base.sample(0.02, 7), m = m, ksub = 256))
          val s = time(s"serve load (IVF_PQ m=$m codes + sector store)")(
            Serve.loadIvfPq(index, cents, pq))
          val reorderK = 3 * k
          targets.foreach { t =>
            val (knob, rec) = tune(1, nlist, t)(np =>
              recallOf(qv)(v => s.search(v, k, np, reorderK).map(_._1)))
            val q = qps(v => s.search(v, k, knob, reorderK))
            report(s"ivf_pq_m$m", "nprobe", knob, rec, q)
            if (rec >= t)
              reportThreads(s"ivf_pq_m$m", "nprobe", knob)(v => s.search(v, k, knob, reorderK))
          }
        }
      }

      // ---- SCANN: same coded artifact in its with_raw_data rerank
      // configuration; the reference sweeps reorder_k ∈ {256..1024}
      // (`benchmark_float_qps.cpp:408-409`) — knob = nprobe per
      // reorder_k point. CODE FIDELITY per the reference's own SCANN
      // convention (faiss fast-scan): m = dim/2 two-dim subquantizers at
      // nbits=4 (ksub=16) — the r12 run's m=16/ksub=256 was UNDER the
      // reference's fidelity and its UNREACHED 0.95 rows were a config
      // artifact (ADC too coarse for the true top-100 to enter even a
      // 1024-wide reorder window), not a family ceiling. ----
      if (families("scann")) {
        val scannM = sys.env.get("GRAFT_SCANN_M").map(_.toInt).getOrElse(math.max(8, dim / 2))
        val scannKsub = sys.env.getOrElse("GRAFT_SCANN_KSUB", "16").toInt
        val packedBits = scannM * (32 - Integer.numberOfLeadingZeros(scannKsub - 1))
        val pq = time(s"scann train (m=$scannM, ksub=$scannKsub)")(
          ProductQuant.train(spark, base.sample(0.02, 7), m = scannM, ksub = scannKsub))
        println(s"  (scann code fidelity: m=$scannM ksub=$scannKsub = " +
          s"${packedBits / 8} B/node packed, $scannM B/node resident here)")
        val s = time(s"serve load (SCANN m=$scannM codes + sector store)")(
          Serve.loadIvfPq(index, cents, pq))
        Seq(256, 512, 1024).foreach { reorderK =>
          targets.foreach { t =>
            val (knob, rec) = tune(1, nlist, t)(np =>
              recallOf(qv)(v => s.search(v, k, np, reorderK).map(_._1)))
            val q = qps(v => s.search(v, k, knob, reorderK))
            report(s"scann_reorder$reorderK", "nprobe", knob, rec, q)
            if (rec >= t)
              reportThreads(s"scann_reorder$reorderK", "nprobe", knob)(
                v => s.search(v, k, knob, reorderK))
          }
        }
      }
      // ---- RANGE-SEARCH QPS, IVF arms (`benchmark_float_range.cpp`):
      // ivf_flat serves V5 through the LOSSLESS centroid-ball prune
      // (lists intersecting the shell are scanned exactly — recall 1.0
      // by construction, QPS is the measurement); ivf_sq8 bands by
      // decode-inline distance over nprobe lists — knob tuned per
      // target like the knn rows. ----
      if (families("range")) {
        val sF = time("serve load (IVF fp32 lists, range)")(
          Serve.loadIvf(index, cents, Metric.L2))
        val radiiMap = new java.util.HashMap[Long, Double]()
        IvfIndex.listRadii(index, cents).collect()
          .foreach(r => radiiMap.put(r.getLong(0), r.getDouble(1)))
        val recF = recallRange(v => sF.rangeSearch(v, rangeRadius, 0.0, radiiMap).map(_._1))
        val qF = qps(v => sF.rangeSearch(v, rangeRadius, 0.0, radiiMap))
        reportRange("ivf_flat", "nlist", nlist, recF, qF)

        val st8 = Quantization.sq8Train(base)
        val s8 = time("serve load (IVF_SQ8 codes, range)")(
          Serve.loadIvfSq8(index, cents, Some(st8)))
        targets.foreach { t =>
          val (knob, rec) = tune(1, nlist, t)(np =>
            recallRange(v => s8.rangeSearch(v, rangeRadius, 0.0, np).map(_._1)))
          val q = qps(v => s8.rangeSearch(v, rangeRadius, 0.0, knob))
          reportRange("ivf_sq8", "nprobe", knob, rec, q)
        }

        // IVF_PQ range (`benchmark_float_range.cpp:277-294` sweeps m at
        // nbits=8 over the same ivf range path): one arm at m=32 — the
        // coded tier's decode-inline shell over nprobe lists, knob =
        // nprobe per range-recall target.
        val pqR = time("ivf_pq range train (m=32, ksub=256)")(
          ProductQuant.train(spark, base.sample(0.02, 7), m = 32, ksub = 256))
        val sPq = time("serve load (IVF_PQ m=32 codes, range)")(
          Serve.loadIvfPq(index, cents, pqR))
        targets.foreach { t =>
          val (knob, rec) = tune(1, nlist, t)(np =>
            recallRange(v => sPq.rangeSearch(v, rangeRadius, 0.0, np).map(_._1)))
          val q = qps(v => sPq.rangeSearch(v, rangeRadius, 0.0, knob))
          reportRange("ivf_pq_m32", "nprobe", knob, rec, q)
        }
      }
      index.unpersist()
    }

    if (!families("graph") && !families("diskann") && !families("cagra") &&
      !families("filtered") && !families("range")) {
      spark.stop()
      return
    }

    // ---- graph walk (HNSW serving): knob = ef in [k, 4096] ----
    // IVF-bucketed build (never all-pairs).
    val gNlist = 4000
    val gStep = math.max(1L, nb.toLong / gNlist)
    val gCents = base.filter(col("id") % gStep === 0)
      .select((col("id") / gStep).cast("long").as("cluster_id"), col("vec").as("centroid"))
    // degree 16 ≈ HNSW's default M. A PLAIN kNN graph at this degree is a
    // poor navigator — its edges all point into the local clique and the
    // r10 run measured a hard 0.651 recall ceiling at ef=4096 no matter
    // the knob. The DIVERSIFIED build (NN-descent refinement → detour
    // prune with the Vamana α slack → reverse-edge merge) is what the
    // reference's graph indexes actually ship (hnswlib heuristic neighbor
    // selection; DiskANN RobustPrune; CAGRA optimize) and is the default
    // here. Env knobs for sweep re-runs: GRAFT_GRAPH_BUILD=plain|div,
    // GRAFT_INTER_DEGREE, GRAFT_DESCENT_ROUNDS, GRAFT_ALPHA.
    val buildMode = sys.env.getOrElse("GRAFT_GRAPH_BUILD", "div")
    val degree = sys.env.getOrElse("GRAFT_DEGREE", "16").toInt
    val interDegree = sys.env.getOrElse("GRAFT_INTER_DEGREE", "32").toInt
    val descentRounds = sys.env.getOrElse("GRAFT_DESCENT_ROUNDS", "1").toInt
    val alpha = sys.env.getOrElse("GRAFT_ALPHA", "1.0").toDouble
    // GRAFT_GRAPH_DIR: parquet cache for the built graph, so a knob re-run
    // of one serving family (diskann beam iters, say) doesn't repay the
    // build — the V9 serialize/load contract applied to the harness. The
    // cached graph is a pure function of the corpus knobs (nb, dim, noise,
    // centers) AND the build knobs (mode, degree, interDegree, rounds,
    // alpha), so BOTH sets are written as a meta file next to the parquet
    // and re-checked on load — a re-run with different knobs fails loudly
    // instead of silently serving a stale graph under fresh labels.
    val graphDir = sys.env.get("GRAFT_GRAPH_DIR")
    val graphMeta = s"mode=$buildMode degree=$degree inter=$interDegree " +
      s"rounds=$descentRounds alpha=$alpha nb=$nb dim=$dim noise=$noise centers=$centers"
    // only the hnsw/diskann/filtered/range arms consult this graph —
    // a cagra-only re-run must not pay the build
    val needHnswGraph =
      families("graph") || families("diskann") || families("filtered") || families("range")
    def cached(d: String): Boolean = new java.io.File(s"$d/_SUCCESS").exists
    def checkMeta(d: String): Unit = {
      val mf = java.nio.file.Paths.get(d, "_GRAFT_META")
      if (!java.nio.file.Files.exists(mf))
        println(s"WARNING: graph cache $d has no _GRAFT_META (pre-r13 cache) — " +
          s"build knobs unverified; expected [$graphMeta]")
      else {
        val got = new String(java.nio.file.Files.readAllBytes(mf), "UTF-8").trim
        require(got == graphMeta,
          s"graph cache $d was built with [$got] but this run wants [$graphMeta] — " +
            "delete the cache dir or match the knobs")
      }
    }
    val graph = if (!needHnswGraph) null else graphDir.filter(cached) match {
      case Some(d) =>
        checkMeta(d)
        time(s"graph load ($d)") {
          val g = spark.read.parquet(d).persist()
          g.count()
          g
        }
      case None =>
        val g0 = time(
          s"graph build $buildMode (degree $degree, inter=$interDegree, rounds=$descentRounds, " +
            s"alpha=$alpha, nprobe 2, nlist=$gNlist)") {
          val g =
            if (buildMode == "plain")
              GraphSearch.knnGraphIvf(base, gCents, degree = degree, nprobe = 2).persist()
            else
              GraphSearch.knnGraphDiversified(base, gCents, degree = degree,
                intermediateDegree = interDegree, nprobe = 2,
                descentRounds = descentRounds, sampleDegree = 8, alpha = alpha)
          g.count()
          g
        }
        graphDir.foreach { d =>
          g0.write.mode("overwrite").parquet(d)
          java.nio.file.Files.write(java.nio.file.Paths.get(d, "_GRAFT_META"),
            (graphMeta + "\n").getBytes("UTF-8"))
          println(s"graph cached -> $d [$graphMeta]")
        }
        g0
    }
    // ENTRY COVERAGE MUST TRACK THE CORPUS'S CLUSTER COUNT: a kNN graph
    // on tightly clustered data is one island per cluster, so entries
    // below the cluster count leave islands unreachable at ANY ef —
    // measured recall@100 = 0.08 with 4k stride entries over this
    // corpus's 20k latent clusters (walks exited in ~1 ms: nothing left
    // to expand into). One entry per cluster is the factory arm's own
    // per-cluster-medoid seeding rule; here the cluster label is the
    // generator's, standing in for the nlist≈cluster-count kmeans a
    // real deployment trains (paying that 20k-centroid kmeans inside a
    // serving benchmark would measure the trainer, not the walk).
    val entries = base
      .groupBy(pmod(xxhash64(col("id")), lit(centers)).as("_c"))
      .agg(min(col("id")).as("nid"))
      .select(col("nid"))
    if (families("graph") || families("filtered") || families("range")) {
      val s = time("serve load (graph + fp32 vectors)")(
        Serve.load(graph, base, entries, Metric.L2)).enableCoarseEntries()
      var knob80 = 4096
      if (families("graph")) targets.foreach { t =>
        val (knob, rec) = tune(k, 4096, t)(ef =>
          recallOf(qv)(v => s.search(v, k, ef).map(_._1)))
        val q = qps(v => s.search(v, k, knob))
        report("hnsw_graph", "ef", knob, rec, q)
        if (t == 0.80 && rec >= t) knob80 = knob
        if (rec >= t) reportThreads("hnsw_graph", "ef", knob)(v => s.search(v, k, knob))
      }

      // ---- RANGE-SEARCH QPS, graph arm: the beam stream's ef-bounded
      // pool filtered to the shell (`faiss_hnsw.cc:1319-1478` range-from-
      // beam contract) — knob = ef tuned to the range-recall target. ----
      if (families("range")) {
        targets.foreach { t =>
          val (knob, rec) = tune(k, 4096, t)(ef =>
            recallRange(v => s.rangeSearch(v, rangeRadius, 0.0, ef).map(_._1)))
          val q = qps(v => s.rangeSearch(v, rangeRadius, 0.0, knob))
          reportRange("hnsw_graph", "ef", knob, rec, q)
        }
        // IDMAP (`benchmark_float_range.cpp:235-245`): the range
        // benchmark's brute-force baseline family — exact scan over the
        // resident raw tier, recall 1.0 by construction.
        val qF = qps(v => s.bruteRangeSearch(v, rangeRadius, 0.0))
        reportRange("flat_idmap", "n", nb, 1.0, qF)
      }

      // ---- bitset-filtered QPS on the graph walk
      // (`benchmark_float_bitset.cpp` HNSW arm): filtered nodes still
      // route but cannot answer; at filtered-out ≥ FilterRatioKnn=0.93
      // the reference's conditional wrapper drops the graph entirely for
      // a survivor scan (`IndexConditionalWrapper.h:28`) — the decision
      // is reported and the fallback measured (exact over survivors). ----
      if (families("filtered")) {
        Seq(0.50, 0.90, 0.93, 0.97).foreach { ratio =>
          val allowedPct = math.round((1.0 - ratio) * 100).toInt
          val pred: Long => Boolean = id => id % 100 < allowedPct
          val truthF: Map[Long, Set[Long]] =
            time(f"filtered ground truth (ratio=$ratio%.2f)")(
              BruteForce.knnFused(queries,
                base.filter(col("id") % 100 < allowedPct), k, Metric.L2,
                roundDist = Some(4))
                .select("qid", "nid").collect()
                .groupBy(_.getLong(0))
                .map { case (q, rows) => q -> rows.map(_.getLong(1)).toSet })
          def recallF(search: Array[Float] => Seq[Long]): Double = {
            var hits = 0L
            var denom = 0L
            qv.foreach { case (qid, v) =>
              val tr = truthF.getOrElse(qid, Set.empty)
              denom += tr.size
              hits += search(v).count(tr.contains)
            }
            hits.toDouble / math.max(1L, denom)
          }
          val surviving = nb.toLong * allowedPct / 100
          val decision = AdaptiveSearch.choose(k, nb.toLong, surviving)
          // under heavy filters the walk needs a wider candidate buffer
          // to gather k allowed answers — the same cost scaling the
          // reference's wrapper avoids by falling back at 0.93
          val ef = math.min(4096, (knob80.toLong * nb / math.max(1L, surviving)).toInt)
          val (rec, q) =
            if (decision == "bf")
              // the wrapper's actual fallback: exact scan over survivors
              (recallF(v => s.bruteSearch(v, k, pred).map(_._1)),
                qps(v => s.bruteSearch(v, k, pred)))
            else
              (recallF(v => s.search(v, k, ef, pred).map(_._1)),
                qps(v => s.search(v, k, ef, pred)))
          println(f"PROTOCOL_FILTERED family=hnsw_graph ratio=$ratio%.2f " +
            f"decision=$decision ef=$ef (scaled from $knob80) " +
            f"recall@$k=$rec%.3f qps=$q%.1f")
        }
      }
    }

    // ---- DiskANN (codes+graph resident, sector-paged raw + warm cache):
    // knob = search_list_size L in [k, 1024]. Tuning evals run on a
    // 16-query subset (each eval pages the visited set from disk); the
    // reported recall/QPS at the tuned L use all nq queries. ----
    if (families("diskann")) {
      // STEERING-CODE FIDELITY is the binding constraint at nb=1M
      // (SCALE_RUN r11: the diversified graph moved recall 0.595 → 0.741
      // at L=1024, so the graph is fixed and the m=dim/4, ksub=16 ADC is
      // what caps the beam — it wanders where ADC is coarse and exact
      // rescoring cannot recover nodes never visited). The reference
      // holds recall by spending RAM on codes (`pq_code_budget_gb`,
      // `diskann.cc` build config — more chunks per vector); same trade
      // here: m=dim/2 two-dim subcodes at ksub=256 (nbits=8, the faiss
      // default) = 64 B/node steering. Env knobs for sweep re-runs:
      // GRAFT_PQ_M, GRAFT_PQ_KSUB, GRAFT_BEAM_ITERS.
      val pqM = sys.env.get("GRAFT_PQ_M").map(_.toInt).getOrElse(math.max(8, dim / 2))
      val pqKsub = sys.env.getOrElse("GRAFT_PQ_KSUB", "256").toInt
      val beamIters = sys.env.getOrElse("GRAFT_BEAM_ITERS", "3").toInt
      val pq = time(s"pq train (m=$pqM, ksub=$pqKsub)")(
        ProductQuant.train(spark, base.sample(0.02, 7), m = pqM, ksub = pqKsub))
      val diskann = new DiskAnnIndex(
        graph, base.select(col("id"), ProductQuant.encodeExpr(col("vec"), pq).as("codes")),
        base, entries, pq, searchListSize = k, beamIters = beamIters)
      val s0 = time("serve load (diskann + warm cache nb/10)")(
        Serve.loadDiskAnn(diskann, cacheNodes = nb / 10))
      println(s"  (diskann resident: codes+graph ${s0.residentBytes} B " +
        s"[${s0.residentBytes / math.max(1, nb)} B/node], " +
        s"warm cache ${s0.residentCacheBytes} B)")
      // tune-subset size: 16 keeps each eval's paged IO cheap, but at
      // nb=1M the 16q recall estimate carries ±0.02 — enough to pick a
      // knob whose full-nq recall lands just under the target (measured:
      // 16q 0.800 @ L=722 vs full-nq 0.778, while L=1024 posts 0.817).
      // GRAFT_TUNE_NQ=100 tunes on the full query set for the committed
      // protocol rows; the default stays cheap for iteration.
      val tuneNq = sys.env.getOrElse("GRAFT_TUNE_NQ", "16").toInt
      val sub16 = qv.take(tuneNq)
      // GRAFT_DISKANN_L pins the knob and skips the binary search — for
      // re-measuring QPS/threads at an already-tuned L without repaying
      // the ~20 min full-nq tune (recall is still measured and reported
      // at the pinned knob, so the row stays honest).
      // GRAFT_DISKANN_TARGET names the target a pinned re-measure belongs
      // to (default: first target) so the row and its thread gate are
      // labeled against the knob's intended target, not always 0.80.
      // GRAFT_DISKANN_LMAX lifts the r12 sweep ceiling (default 1024 for
      // the fixed-hop walk; the beam arm below sweeps to 4096 by default).
      val pinnedL = sys.env.get("GRAFT_DISKANN_L").map(_.toInt)
      val pinnedTarget = sys.env.get("GRAFT_DISKANN_TARGET").map(_.toDouble)
      val lMax = sys.env.getOrElse("GRAFT_DISKANN_LMAX", "1024").toInt
      val effTargets = pinnedL match {
        case Some(_) => Seq(pinnedTarget.getOrElse(targets.head))
        case None =>
          pinnedTarget.foreach(t => println(
            s"  (GRAFT_DISKANN_TARGET=$t ignored: only applies with GRAFT_DISKANN_L pinned)"))
          targets
      }
      val mode = sys.env.getOrElse("GRAFT_DISKANN_MODE", "both")
      if (mode == "walk" || mode == "both") effTargets.foreach { t =>
        val (knob, rec16) = pinnedL match {
          case Some(l) =>
            (l, recallOf(sub16)(v => s0.withSearchListSize(l).search(v, k).map(_._1)))
          case None => tune(k, lMax, t) { l =>
            val s = s0.withSearchListSize(l)
            recallOf(sub16)(v => s.search(v, k).map(_._1))
          }
        }
        val s = s0.withSearchListSize(knob)
        val rec = recallOf(qv)(v => s.search(v, k).map(_._1))
        val q = qps(v => s.search(v, k))
        println(f"  (diskann tune recall on ${tuneNq}q, target $t: $rec16%.3f)")
        report("diskann", "search_list_size", knob, rec, q)
        if (rec >= t)
          reportThreads("diskann", "search_list_size", knob)(v => s.search(v, k))
      }

      // ---- DiskANN CONVERGENT BEAM (the reference's cached_beam_search
      // loop, `diskann.cc:560-660`): expand only the beamWidth best
      // unexpanded candidates per hop, their sector reads in flight
      // together, exact distances kept mid-walk (full_retset), walk runs
      // until the L-list converges. IO ∝ expansions (≈ L), not the
      // fixed-hop walk's full ADC-visited set — both the recall and the
      // QPS lever for the 0.95 row. Knob = L in [k, GRAFT_BEAM_LMAX]. ----
      if (mode == "beam" || mode == "both") {
        val beamWidth = sys.env.getOrElse("GRAFT_BEAM_WIDTH", "8").toInt
        val beamLMax = sys.env.getOrElse("GRAFT_BEAM_LMAX", "4096").toInt
        effTargets.foreach { t =>
          val (knob, rec16) = pinnedL match {
            case Some(l) =>
              (l, recallOf(sub16)(v =>
                s0.withSearchListSize(l).searchBeam(v, k, beamWidth).map(_._1)))
            case None => tune(k, beamLMax, t) { l =>
              val s = s0.withSearchListSize(l)
              recallOf(sub16)(v => s.searchBeam(v, k, beamWidth).map(_._1))
            }
          }
          val s = s0.withSearchListSize(knob)
          val rec = recallOf(qv)(v => s.searchBeam(v, k, beamWidth).map(_._1))
          val q = qps(v => s.searchBeam(v, k, beamWidth))
          println(f"  (diskann_beam tune recall on ${tuneNq}q, target $t: $rec16%.3f; " +
            f"last query: hops=${s.lastHops} expanded=${s.lastExpanded} " +
            f"fetched=${s.lastRawFetched} cacheHits=${s.lastCacheHits})")
          report(s"diskann_beam_w$beamWidth", "search_list_size", knob, rec, q)
          if (rec >= t)
            reportThreads(s"diskann_beam_w$beamWidth", "search_list_size", knob)(
              v => s.searchBeam(v, k, beamWidth))
        }
      }

      // ---- RANGE-SEARCH QPS, DiskANN arm (`benchmark_float_range.cpp:
      // 315-345`; served through the iterator-backed fallback the
      // reference uses, `index_node.h:170-230`): the convergent beam's
      // expanded pool filtered to the shell — every answered distance is
      // exact and sector-paid. Knob = L tuned to the range-recall target
      // on the tune subset (each eval pages sectors), measured full-nq. ----
      if (families("range")) {
        val beamWidth = sys.env.getOrElse("GRAFT_BEAM_WIDTH", "8").toInt
        val beamLMax = sys.env.getOrElse("GRAFT_BEAM_LMAX", "4096").toInt
        def recallRangeSub(sub: Seq[(Long, Array[Float])])(
            search: Array[Float] => Seq[Long]): Double = {
          var hits = 0L
          var denom = 0L
          sub.foreach { case (qid, v) =>
            val tr = truthRange.getOrElse(qid, Set.empty)
            denom += tr.size
            hits += search(v).count(tr.contains)
          }
          hits.toDouble / math.max(1L, denom)
        }
        val sub = qv.take(tuneNq)
        targets.foreach { t =>
          val (knob, rec16) = tune(k, beamLMax, t) { l =>
            val s = s0.withSearchListSize(l)
            recallRangeSub(sub)(v => s.rangeSearch(v, rangeRadius, 0.0, beamWidth).map(_._1))
          }
          val s = s0.withSearchListSize(knob)
          val rec = recallRange(v => s.rangeSearch(v, rangeRadius, 0.0, beamWidth).map(_._1))
          val q = qps(v => s.rangeSearch(v, rangeRadius, 0.0, beamWidth))
          println(f"  (diskann range tune recall on ${tuneNq}q, target $t: $rec16%.3f)")
          reportRange("diskann", "search_list_size", knob, rec, q)
        }
      }
    }

    // ---- CAGRA (CPU-adapt serving, gpu_raft_cagra.cc:48-60):
    // knob = itopk (the walk's candidate buffer = ef) in [k, 4096].
    // DEGREE IS THE RECALL-CEILING LEVER (the r12 hnsw lesson: 16→24→32
    // lifted the walk ceiling 0.883→0.923→0.950) — the r11 0.808 ceiling
    // was measured on a degree-8 graph; the reference's CAGRA defaults
    // are intermediate 128 → degree 64. GRAFT_CAGRA_DEGREE /
    // GRAFT_CAGRA_INTER sweep it; GRAFT_CAGRA_DIR caches the built graph
    // (meta-keyed like the hnsw cache). ----
    if (families("cagra")) {
      val cDeg = sys.env.getOrElse("GRAFT_CAGRA_DEGREE", "8").toInt
      val cInter = sys.env.get("GRAFT_CAGRA_INTER").map(_.toInt).getOrElse(math.max(8, cDeg))
      val cagraDir = sys.env.get("GRAFT_CAGRA_DIR")
      val cagraMeta = s"cagra inter=$cInter degree=$cDeg " +
        s"nb=$nb dim=$dim noise=$noise centers=$centers"
      def checkCagraMeta(d: String): Unit = {
        val mf = java.nio.file.Paths.get(d, "_GRAFT_META")
        require(java.nio.file.Files.exists(mf),
          s"cagra cache $d has no _GRAFT_META — delete the dir to rebuild")
        val got = new String(java.nio.file.Files.readAllBytes(mf), "UTF-8").trim
        require(got == cagraMeta,
          s"cagra cache $d was built with [$got] but this run wants [$cagraMeta]")
      }
      val cagraGraph = cagraDir.filter(cached) match {
        case Some(d) =>
          checkCagraMeta(d)
          time(s"cagra graph load ($d)") {
            val g = spark.read.parquet(d).persist()
            g.count()
            g
          }
        case None =>
          val g0 = time(s"cagra build (intermediate $cInter -> degree $cDeg, optimize)") {
            val g = Cagra.build(base, gCents, intermediateDegree = cInter, graphDegree = cDeg,
              nprobe = 2, metric = Metric.L2, roundDist = Some(4))
              .select(col("src"), col("dst")).persist()
            g.count()
            g
          }
          cagraDir.foreach { d =>
            g0.write.mode("overwrite").parquet(d)
            java.nio.file.Files.write(java.nio.file.Paths.get(d, "_GRAFT_META"),
              (cagraMeta + "\n").getBytes("UTF-8"))
            println(s"cagra graph cached -> $d [$cagraMeta]")
          }
          g0
      }
      val s = time("serve load (cagra graph + fp32 vectors)")(
        Serve.load(cagraGraph, base, entries, Metric.L2)).enableCoarseEntries()
      // GRAFT_CAGRA_ITOPK_MAX lifts the sweep cap: the d32 arm measured
      // 0.945 AT itopk=4096 — the cap, not the graph, decided that row
      val itopkMax = sys.env.getOrElse("GRAFT_CAGRA_ITOPK_MAX", "4096").toInt
      targets.foreach { t =>
        val (knob, rec) = tune(k, itopkMax, t)(itopk =>
          recallOf(qv)(v => s.search(v, k, itopk).map(_._1)))
        val q = qps(v => s.search(v, k, knob))
        report(s"cagra_d$cDeg", "itopk", knob, rec, q)
        if (rec >= t) reportThreads(s"cagra_d$cDeg", "itopk", knob)(v => s.search(v, k, knob))
      }
      cagraGraph.unpersist()
    }

    spark.stop()
  }
}
