package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators._

/** Scale stress: synthesize nb random vectors (seeded, distributed
  * generation — no driver-side data), then time exact kNN vs IVF probing.
  * Usage: runMain graft.Scale [nb] [nq] [dim] [nlist] [nprobe]
  */
object Scale {
  def main(args: Array[String]): Unit = {
    val nb = if (args.length > 0) args(0).toInt else 200000
    val nq = if (args.length > 1) args(1).toInt else 100
    val dim = if (args.length > 2) args(2).toInt else 64
    val nlist = if (args.length > 3) args(3).toInt else 64
    val nprobe = if (args.length > 4) args(4).toInt else 4
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // deterministic per-row vectors: rand(seed) is partition-deterministic
    def gen(n: Int, idCol: String, vecCol: String): DataFrame =
      spark.range(n.toLong).toDF(idCol)
        .withColumn(vecCol, transform(sequence(lit(1), lit(dim)),
          i => ((pmod(xxhash64(col(idCol) * 1000 + i), lit(2000)).cast("double") - 1000d) / 1000d)
            .cast("float")))

    val base = gen(nb, "id", "vec").persist()
    val queries = gen(nq, "qid", "qvec")
    println(s"base=${base.count()} rows, dim=$dim")

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    time("bf_knn k=10")(BruteForce.knn(queries, base, 10, Metric.L2).count())
    val cents = time("ivf train")(IvfIndex.trainKMeans(spark, base.sample(0.1, 42), nlist))
    val index = time("ivf build (assign)")(IvfIndex.build(base, cents).persist())
    index.count()
    time(s"ivf search nprobe=$nprobe")(
      IvfIndex.search(queries, index, cents, 10, nprobe).count())
    val truth = BruteForce.knn(queries, base, 10, Metric.L2)
    val got = IvfIndex.search(queries, index, cents, 10, nprobe)
    val t = truth.select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val g = got.select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    println(f"ivf recall@10: ${g.intersect(t).size.toDouble / t.size}%.3f")

    // the deployment shape: index saved partitionBy(cluster_id), search
    // over the LOADED index — probed list ids reach the file scan as
    // partition pruning, so wall time tracks nprobe/nlist, not nb
    val dir = java.nio.file.Files.createTempDirectory("graft-scale-ivf").toString
    time("ivf save (partitioned parquet)") {
      index.write.mode("overwrite").partitionBy("cluster_id").parquet(s"$dir/lists")
    }
    val loaded = spark.read.parquet(s"$dir/lists")
    time(s"ivf search on parquet, nprobe=$nprobe (partition-pruned)")(
      IvfIndex.search(queries, loaded, cents, 10, nprobe).count())
    time(s"ivf search on parquet, nprobe=$nlist (full scan)")(
      IvfIndex.search(queries, loaded, cents, 10, nlist).count())

    // ---- sparse: Zipfian corpus where MaxScore pruning ENGAGES ----
    // (the harness corpus has a 31-term vocabulary, which always takes the
    // score-all fallback; real corpora are Zipfian and the essential-list
    // candidate branch is the path that runs there)
    val vocab = 20000
    val perDoc = 40
    def sparseGen(n: Int, rows: Int, salt: Int): DataFrame =
      spark.range(n.toLong).toDF("id")
        .select(col("id"), explode(sequence(lit(1), lit(rows))).as("j"))
        .select(col("id"),
          // u^3 density → Zipf-ish head: term 0 is the most frequent
          floor(pow(pmod(xxhash64(col("id") * 7919 + col("j") * 31 + salt), lit(1000000))
            .cast("double") / 1000000.0d, 3.0d) * vocab).cast("long").as("term"),
          (pmod(xxhash64(col("id") + col("j") * 7 + salt), lit(5)) + 1L).as("tf"))
        .groupBy(col("id"), col("term")).agg(sum(col("tf")).as("tf"))
    val bp = sparseGen(nb, perDoc, 0)
      .select(col("term"), col("id"), col("tf"), lit(perDoc).cast("long").as("dl"))
      .persist()
    println(s"sparse postings=${bp.count()} vocab≈$vocab")
    // idf-style query weighting (rare terms matter more — the realistic
    // IR shape): head terms get weight 1, tail terms up to 10; this is
    // what makes the essential-list split discriminate
    val qp = sparseGen(50, 30, 99)
      .select(col("id").as("qid"), col("term"),
        (lit(1L) + col("term") * 9L / vocab.toLong).as("qtf"))
    val termStats = bp.groupBy(col("term"))
      .agg(count(lit(1)).as("df"), max(col("tf")).as("max_tf"), min(col("tf")).as("min_tf"))
      .persist()
    termStats.count()
    val model = new graft.operators.SparseIndexModel(bp, termStats, (nb.toLong, perDoc.toDouble), 1.2, 0.75)
    val nRows = time("sparse naive searchIP")(
      graft.operators.SparseSearch
        .searchIP(qp, bp.select(col("term"), col("id"), col("tf")), 10).collect())
    val pRows = time("sparse MaxScore (stats-pruned)")(
      graft.operators.SparseSearch.searchIPMaxScore(qp, model, 10).collect())
    time("sparse MaxScore (candidate branch forced)")(
      graft.operators.SparseSearch.searchIPMaxScore(qp, model, 10, fallbackRatio = 2.0).count())
    val same = nRows.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet ==
      pRows.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    println(s"sparse pruned == naive: $same")
    spark.stop()
  }
}
