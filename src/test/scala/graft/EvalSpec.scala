package graft

import org.apache.spark.sql.functions._

import graft.operators.{BruteForce, Eval, Metric, Packing, TextAnalysis}

/** Evaluation/mining utilities + chunking/normalization invariants. */
class EvalSpec extends SparkSpec {

  private lazy val docs = spark.read.parquet(s"$sf0001/documents.parquet")
  private lazy val embs = spark.read.parquet(s"$sf0001/embeddings.parquet")
  private lazy val queries = embs
    .filter(col("vec_id") % 100 === 0)
    .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
  private lazy val base = embs
    .select(col("vec_id").as("id"), col("embedding").as("vec"), col("label"))

  test("recallAtK of a result against itself is exactly 10000 bp") {
    val exact = BruteForce.knn(queries, base, 10, Metric.L2, roundDist = Some(4))
    val r = Eval.recallAtK(exact, exact, 10).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      assert(row.getAs[Int]("hits") == 10)
      assert(row.getAs[Long]("recall_bp") == 10000L)
    }
  }

  test("recallAtK counts zero hits for a disjoint approx result") {
    val exact = BruteForce.knn(queries, base, 10, Metric.L2, roundDist = Some(4))
    val shifted = exact.withColumn("nid", col("nid") + 1000000L)
    val r = Eval.recallAtK(shifted, exact, 10).collect()
    r.foreach { row =>
      assert(row.getAs[Int]("hits") == 0)
      assert(row.getAs[Long]("recall_bp") == 0L)
    }
    // every exact qid keeps a row even with no hits
    assert(r.length == exact.select("qid").distinct().count())
  }

  test("hardNegatives never returns the query's own label and matches the filtered reference") {
    val q = embs
      .filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"), col("label").as("qlabel"))
    val got = Eval.hardNegatives(q, base, 10, Metric.L2, roundDist = Some(4))
    val labels = got
      .join(q.select(col("qid"), col("qlabel")), "qid")
      .join(base.select(col("id").as("nid"), col("label")), "nid")
    assert(labels.filter(col("label") === col("qlabel")).count() == 0)
    // reference: per-query window ranking over the label-filtered pairs
    val ref = BruteForce.topKWindow(
      broadcast(q)
        .crossJoin(base)
        .filter(col("label") =!= col("qlabel"))
        .select(col("qid"), col("id").as("nid"),
          round(Metric.L2.dist(col("qvec"), col("vec")), 4).as("dist")),
      10, ascending = true)
      .select("qid", "nid", "dist", "rnk")
    assert(got.exceptAll(ref).isEmpty && ref.exceptAll(got).isEmpty)
  }

  test("chunkOverlap covers every token and overlaps by window - stride") {
    val window = 32
    val stride = 24
    val chunks = Packing.chunkOverlap(docs, window, stride).collect()
    val nTokens = docs
      .select(col("doc_id"), size(TextAnalysis.tokens(col("text"))).as("n"))
      .collect()
      .map(r => r.getLong(0) -> r.getInt(1))
      .toMap
    chunks.groupBy(_.getAs[Long]("doc_id")).foreach { case (docId, rows) =>
      val n = nTokens(docId)
      val sorted = rows.sortBy(_.getAs[Int]("chunk_idx"))
      // starts are exactly 0, stride, 2·stride, … < n
      assert(sorted.map(_.getAs[Int]("start_tok")).toSeq ==
        (0 until n by stride).toSeq)
      // every chunk is window-wide except possibly at the tail, and the
      // last chunk reaches the final token
      sorted.foreach { r =>
        val st = r.getAs[Int]("start_tok")
        assert(r.getAs[Int]("n_tokens") == math.min(window, n - st))
      }
      val last = sorted.last
      assert(last.getAs[Int]("start_tok") + last.getAs[Int]("n_tokens") == n)
    }
  }

  test("chunkOverlap fingerprint equals the document fingerprint when one chunk covers it") {
    import spark.implicits._
    val tiny = Seq((1L, "a b c d e")).toDF("doc_id", "text")
    val chunk = Packing.chunkOverlap(tiny, window = 32, stride = 24).collect()
    assert(chunk.length == 1)
    val fp = tiny
      .select(TextAnalysis.fingerprint(TextAnalysis.tokens(col("text"))).as("fp"))
      .head()
      .getLong(0)
    assert(chunk.head.getAs[Long]("chunk_fp") == fp)
  }

  test("normalize canon: case, punctuation and whitespace variants collapse") {
    import spark.implicits._
    val df = Seq(
      (1L, "Hello,  World!"),
      (2L, "hello world"),
      (3L, "HELLO -- world"),
      (4L, "unrelated text")
    ).toDF("doc_id", "text")
    val n = df.select(col("doc_id"), TextAnalysis.normalize(col("text")).as("nt")).collect()
    val byId = n.map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(byId(1L) == "hello world")
    assert(byId(2L) == "hello world")
    assert(byId(3L) == "hello world")
    assert(byId(4L) == "unrelated text")
  }

  test("subwordStats splits greedily into ≤4-char pieces with punct singletons") {
    import spark.implicits._
    val df = Seq((1L, "abcdefgh xy z9")).toDF("doc_id", "text")
    val r = TextAnalysis.subwordStats(df).head()
    // abcdefgh → abcd, efgh; xy; z9 → 4 subtokens, 12 chars
    assert(r.getAs[Int]("n_subtok") == 4)
    assert(r.getAs[Int]("n_subtok_uniq") == 4)
    assert(r.getAs[Long]("chars_per_subtok_bp") == 12L * 10000L / 4L)
  }

  test("sourceVocabOverlap is exact Jaccard in basis points on a toy corpus") {
    import spark.implicits._
    val df = Seq(
      (1L, "s1", "a b c"),
      (2L, "s1", "c d"),
      (3L, "s2", "c d e"),
      (4L, "s3", "x y")
    ).toDF("doc_id", "source", "text")
    val got = TextAnalysis.sourceVocabOverlap(df).collect()
    // s1 vocab {a b c d}, s2 {c d e} → inter 2, union 5 → 4000 bp
    val r12 = got.find(r => r.getString(0) == "s1" && r.getString(1) == "s2").get
    assert(r12.getAs[Long]("inter_sz") == 2L)
    assert(r12.getAs[Long]("union_sz") == 5L)
    assert(r12.getAs[Long]("jaccard_bp") == 4000L)
    // s3 shares nothing → pair absent (inner join on term)
    assert(!got.exists(r => r.getString(1) == "s3" || r.getString(0) == "s3"))
  }

  test("rankCorrelation: identical arms → 10000 bp, fully reversed arms → -10000 bp") {
    import spark.implicits._
    val armA = Seq((1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3)).toDF("qid", "nid", "rnk")
    val same = Eval.rankCorrelation(armA, armA).collect().head
    assert(same.getAs[Long]("rho_bp") == 10000L && same.getAs[Long]("sum_d2") == 0L)
    val armB = Seq((1L, 10L, 3), (1L, 11L, 2), (1L, 12L, 1)).toDF("qid", "nid", "rnk")
    val rev = Eval.rankCorrelation(armA, armB).collect().head
    // sum_d2 = 4+0+4 = 8; rho = 1 - 6*8/(3*8) = -1
    assert(rev.getAs[Long]("sum_d2") == 8L && rev.getAs[Long]("rho_bp") == -10000L)
  }

  test("knnClassify majority vote with smaller-label tie-break, self excluded") {
    import spark.implicits._
    // query at origin; 2 neighbors labeled 1 at d=1, 2 neighbors labeled 0
    // at d=2 → k=3 sees {1,1,0} → majority 1; k=4 ties 2-2 → label 0 wins
    val base = Seq(
      (0L, Array(0f, 0f), 9), // the query itself (label must not vote)
      (1L, Array(1f, 0f), 1),
      (2L, Array(0f, 1f), 1),
      (3L, Array(2f, 0f), 0),
      (4L, Array(0f, 2f), 0)
    ).toDF("id", "vec", "label")
    val q = Seq((0L, Array(0f, 0f))).toDF("qid", "qvec")
    val k3 = Eval.knnClassify(q, base, 3, Metric.L2, Some(4)).collect().head
    assert(k3.getAs[Int]("pred_label") == 1 && k3.getAs[Long]("votes") == 2L)
    val k4 = Eval.knnClassify(q, base, 4, Metric.L2, Some(4)).collect().head
    assert(k4.getAs[Int]("pred_label") == 0 && k4.getAs[Long]("votes") == 2L)
  }

  test("dimStats per-dim mean/mean_sq/min/max are exact on a toy frame") {
    import spark.implicits._
    val df = Seq(
      Tuple1(Array(1.0f, -2.0f)),
      Tuple1(Array(3.0f, 4.0f))
    ).toDF("embedding")
    val got = Eval.dimStats(df).collect().map(r =>
      r.getAs[Long]("dim") -> r).toMap
    val d1 = got(1L)
    assert(d1.getAs[Long]("n") == 2L)
    assert(d1.getAs[Double]("mean") == 2.0) // (1+3)/2
    assert(d1.getAs[Double]("mean_sq") == 5.0) // (1+9)/2
    assert(d1.getAs[Double]("mn") == 1.0 && d1.getAs[Double]("mx") == 3.0)
    val d2 = got(2L)
    assert(d2.getAs[Double]("mean") == 1.0) // (-2+4)/2
    assert(d2.getAs[Double]("mean_sq") == 10.0) // (4+16)/2
    assert(d2.getAs[Double]("mn") == -2.0 && d2.getAs[Double]("mx") == 4.0)
  }
}
