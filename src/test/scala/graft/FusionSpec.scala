package graft

import org.apache.spark.sql.functions._

import graft.operators.{BruteForce, Fusion, GroupedSearch, Metric}

/** Hybrid rank fusion (RRF + weighted) and group-by search: exact integer
  * scores on hand-computed toy arms, direction awareness, degenerate and
  * missing-arm edge cases, grouped-search invariants vs a windowed
  * reference. */
class FusionSpec extends SparkSpec {
  import spark.implicits._

  private val S = Fusion.RrfScale // 1e12
  private val N = Fusion.NormScale // 1e6

  test("rrf sums exact reciprocal-rank contributions across arms") {
    val armA = Seq((1L, 10L, 0.0, 1), (1L, 11L, 0.0, 2))
      .toDF("qid", "nid", "dist", "rnk")
    val armB = Seq((1L, 11L, 0.0, 1), (1L, 12L, 0.0, 2))
      .toDF("qid", "nid", "dist", "rnk")
    val got = Fusion
      .rrf(Seq(armA, armB), k = 3, k0 = 60)
      .orderBy("rnk")
      .collect()
      .map(r => (r.getAs[Long]("nid"), r.getAs[Long]("score")))
    // 11 in both arms: S/62 + S/61; 10 and 12 single-arm: S/61, S/62
    val expected = Seq(
      (11L, S / 62 + S / 61),
      (10L, S / 61), // ties with nothing; beats 12 (S/62) and nid-breaks none
      (12L, S / 62))
    assert(got.toSeq == expected)
  }

  test("rrf of one arm preserves the arm's order") {
    val arm = Seq((1L, 5L, 0.0, 1), (1L, 9L, 0.0, 2), (1L, 2L, 0.0, 3))
      .toDF("qid", "nid", "dist", "rnk")
    val got = Fusion.rrf(Seq(arm), k = 3).orderBy("rnk")
      .collect().map(_.getAs[Long]("nid"))
    assert(got.toSeq == Seq(5L, 9L, 2L))
  }

  test("weighted normalizes direction-aware and sums integer weights") {
    // ascending arm (L2-like): best = smallest dist → norm 1e6
    val armAsc = Seq((1L, 10L, 1.0), (1L, 11L, 2.0), (1L, 12L, 3.0))
      .toDF("qid", "nid", "dist")
    // descending arm (BM25-like): best = largest
    val armDesc = Seq((1L, 11L, 9.0), (1L, 10L, 5.0), (1L, 13L, 1.0))
      .toDF("qid", "nid", "dist")
    val got = Fusion
      .weighted(Seq((armAsc, true, 700L), (armDesc, false, 300L)), k = 4)
      .collect()
      .map(r => (r.getAs[Long]("nid"), r.getAs[Long]("score")))
      .toMap
    // d4 asc: 10000/20000/30000 → norms 1e6, 5e5, 0; desc: 90000/50000/10000
    // → norms 1e6, 5e5, 0
    assert(got(10L) == 700L * N + 300L * (N / 2))
    assert(got(11L) == 700L * (N / 2) + 300L * N)
    assert(got(12L) == 0L) // worst of asc arm, absent from desc arm
    assert(got(13L) == 0L) // worst of desc arm, absent from asc arm
  }

  test("weighted degenerate arm (all dists equal) normalizes to full scale") {
    val flat = Seq((1L, 1L, 2.5), (1L, 2L, 2.5)).toDF("qid", "nid", "dist")
    val got = Fusion.weighted(Seq((flat, true, 10L)), k = 2)
      .collect().map(r => (r.getAs[Long]("nid"), r.getAs[Long]("score"))).toMap
    assert(got == Map(1L -> 10L * N, 2L -> 10L * N))
  }

  test("retrieveRerank equals exact knn restricted to the candidate set") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val queries = emb.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val base = emb.select(col("vec_id").as("id"), col("embedding").as("vec"))
    // candidate arm: an arbitrary deterministic subset per query
    val cands = queries.select(col("qid"))
      .crossJoin(base.select(col("id").as("nid")))
      .filter((col("nid") + col("qid")) % 7 === 0)
    val got = graft.operators.Fusion
      .retrieveRerank(cands, queries, base, 5, Metric.L2, roundDist = Some(4))
    // reference: exact knn over the base filtered to each query's candidates
    val ref = BruteForce
      .topK(
        BruteForce.pairs(queries, base, Metric.L2, roundDist = Some(4))
          .join(cands, Seq("qid", "nid")),
        5,
        ascending = true)
    assert(got.count() == ref.count() && got.count() > 0)
    assert(got.exceptAll(ref).isEmpty && ref.exceptAll(got).isEmpty)
  }

  private lazy val gBase = Seq(
    (0L, Array(0f, 0f), "a"),
    (1L, Array(1f, 0f), "a"),
    (2L, Array(2f, 0f), "b"),
    (3L, Array(3f, 0f), "b"),
    (4L, Array(9f, 0f), "c"),
    (5L, Array(0.5f, 0f), "c")
  ).toDF("id", "vec", "grp")

  private lazy val gQueries = Seq((100L, Array(0f, 0f))).toDF("qid", "qvec")

  test("knnGrouped ranks groups by best hit and caps hits per group") {
    val got = GroupedSearch
      .knnGrouped(gQueries, gBase, k = 2, groupSize = 2, Metric.L2,
        groupCol = "grp", roundDist = Some(4))
      .orderBy("grp_rnk", "grnk")
      .collect()
      .map(r => (r.getAs[String]("grp"), r.getAs[Long]("nid"),
        r.getAs[Int]("grnk"), r.getAs[Int]("grp_rnk")))
    // best hits: a→0 (0.0), c→5 (0.5), b→2 (2.0); top-2 groups = a, c
    assert(got.toSeq == Seq(
      ("a", 0L, 1, 1), ("a", 1L, 2, 1),
      ("c", 5L, 1, 2), ("c", 4L, 2, 2)))
  }

  test("knnGrouped agrees with a windowed reference on real embeddings") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val queries = emb.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val base = emb.select(col("vec_id").as("id"), col("embedding").as("vec"), col("label"))
    val got = GroupedSearch.knnGrouped(queries, base, k = 4, groupSize = 3,
      Metric.L2, roundDist = Some(4))
    // windowed reference: rank inside (qid,label), then groups by best hit
    import org.apache.spark.sql.expressions.Window
    val p = BruteForce.pairs(queries, base, Metric.L2, roundDist = Some(4),
      carryCols = Seq("label"))
    val pg = p.withColumn("grnk", row_number().over(
        Window.partitionBy("qid", "label").orderBy(col("dist").asc, col("nid").asc)).cast("int"))
      .filter(col("grnk") <= 3)
    val tg = pg.filter(col("grnk") === 1)
      .withColumn("grp_rnk", row_number().over(
        Window.partitionBy("qid").orderBy(col("dist").asc, col("label").asc)).cast("int"))
      .filter(col("grp_rnk") <= 4)
      .select(col("qid"), col("label"), col("grp_rnk"))
    val ref = pg.join(tg, Seq("qid", "label"))
      .select("qid", "label", "nid", "dist", "grnk", "grp_rnk")
    assert(got.count() == ref.count())
    assert(got.exceptAll(ref).isEmpty && ref.exceptAll(got).isEmpty)
  }
}
