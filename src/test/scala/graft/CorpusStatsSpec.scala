package graft

import org.apache.spark.sql.functions._

import graft.operators._

/** Hand-computed toy cases for the round-5 corpus-statistics and
  * incremental/semantic dedup operators.
  */
class CorpusStatsSpec extends SparkSpec {
  import spark.implicits._

  test("rarityScore: tf-weighted mean inverse corpus frequency, exact integers") {
    // vocab: a=2, b=2, c=1, total=5 → rarity a=b=25000, c=50000
    val docs = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    val got = TextAnalysis
      .rarityScore(docs)
      .collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2))))
      .toMap
    assert(got(1L) == ((3, 25000L))) // (2·25000 + 25000) div 3
    assert(got(2L) == ((2, 37500L))) // (25000 + 50000) div 2
  }

  test("vocabCoverage: head/mid/tail basis points with count-then-term rank order") {
    // counts: a=2, b=2, c=1 → rank a=1 (head), b=2 (mid), c=3 (tail)
    val docs = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    val got = TextAnalysis
      .vocabCoverage(docs, head = 1, mid = 1)
      .collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(got(1L) == ((3, 6666L, 3333L, 0L)))
    assert(got(2L) == ((2, 0L, 5000L, 5000L)))
  }

  test("nucleusVocab: boundary bucket resolves in integer arithmetic") {
    // buckets: cnt=2 ×2 terms (mass 4), cnt=1 ×1 (mass 1); total 5.
    // target 50% → need ceil(2.5)=3 → 2 head terms cover 4/5 = 8000 bp
    val docs = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    val rows = TextAnalysis.nucleusVocab(docs, targetsBp = Seq(5000)).collect()
    assert(rows.length == 1)
    assert(rows.head.getInt(0) == 5000)
    assert(rows.head.getLong(1) == 2L)
    assert(rows.head.getLong(2) == 8000L)
  }

  test("pmiBigrams: exact rational scores, tie order, minCount filter") {
    // unigrams: x=3, y=3, z=1 (N=7); bigrams: "x y"=3, "y x"=1, "y z"=1
    val docs = Seq((1L, "x y x y"), (2L, "x y z")).toDF("doc_id", "text")
    val got = TextAnalysis
      .pmiBigrams(docs, minCount = 1, k = 3)
      .collect()
      .map(r => r.getAs[String]("bg") -> ((r.getAs[Long]("pmi_score"), r.getAs[Int]("rnk"))))
      .toMap
    assert(got("x y") == ((3L * 7 * 10000 / 9, 1))) // 23333
    assert(got("y z") == ((1L * 7 * 10000 / 3, 2))) // 23333, tie broken bg asc
    assert(got("y x") == ((1L * 7 * 10000 / 9, 3))) // 7777
    // minCount prunes the singletons
    assert(TextAnalysis.pmiBigrams(docs, minCount = 2, k = 3).count() == 1)
  }

  test("incrementalFlags: exact and near collisions against history only") {
    val history = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "completely different historical content about databases")
    ).toDF("doc_id", "text")
    val batch = Seq(
      (3L, "the quick brown fox jumps over the lazy dog today"), // exact copy of 1
      (4L, "zz yy xx ww vv uu tt ss rr qq") // nothing shared
    ).toDF("doc_id", "text")
    val got = Dedup
      .incrementalFlags(history, batch)
      .collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(1), r.getBoolean(2))))
      .toMap
    assert(got(3L) == ((true, true)))
    assert(!got.contains(4L)) // unflagged docs are not emitted
  }

  test("ndcgAtK / mrrAtK: identity is perfect, disjoint is zero, partial by hand") {
    val exact = Seq((1L, 10L, 1), (1L, 20L, 2), (1L, 30L, 3)).toDF("qid", "nid", "rnk")
    val idcg = Eval.dcgDiscounts(3).sum
    // identity
    val idN = Eval.ndcgAtK(exact, exact, 3).head()
    assert(idN.getLong(1) == idcg && idN.getLong(2) == 10000L)
    assert(Eval.mrrAtK(exact, exact).head().getLong(2) == 1000000L)
    // disjoint
    val other = Seq((1L, 91L, 1), (1L, 92L, 2), (1L, 93L, 3)).toDF("qid", "nid", "rnk")
    val djN = Eval.ndcgAtK(other, exact, 3).head()
    assert(djN.getLong(1) == 0L && djN.getLong(2) == 0L)
    val djM = Eval.mrrAtK(other, exact).head()
    assert(djM.getInt(1) == 0 && djM.getLong(2) == 0L)
    // partial: hits at approx ranks 2 and 3 only
    val approx = Seq((1L, 99L, 1), (1L, 10L, 2), (1L, 30L, 3)).toDF("qid", "nid", "rnk")
    val d = Eval.dcgDiscounts(3)
    val pN = Eval.ndcgAtK(approx, exact, 3).head()
    assert(pN.getLong(1) == d(1) + d(2))
    assert(pN.getLong(2) == (d(1) + d(2)) * 10000L / idcg)
    val pM = Eval.mrrAtK(approx, exact).head()
    assert(pM.getInt(1) == 2 && pM.getLong(2) == 500000L)
  }

  test("freqSpectrum: per-count buckets with type/mass shares") {
    // counts a=2, b=2, c=1 → bucket cnt=2 ×2 types, cnt=1 ×1; types=3, mass=5
    val docs = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    val got = TextAnalysis
      .freqSpectrum(docs)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got(2L) == ((2L, 6666L, 8000L)))
    assert(got(1L) == ((1L, 3333L, 2000L)))
  }

  test("containmentPairs: directed flag for a doc pasted into a longer one") {
    // B = A plus a tail: every shingle of A appears in B → containment(A⊂B)=1,
    // while Jaccard(A,B) < 1 and containment(B⊂A) < 1
    val a = "alpha beta gamma delta epsilon zeta eta theta"
    val b = a + " iota kappa lambda"
    val docs = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
    val got = Dedup
      .containmentPairs(docs, threshold = 0.9)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == Seq((1L, 2L, 1.0)))
  }

  test("semanticDedup: same-cluster lower-id neighbor above threshold is dropped") {
    val emb = Seq(
      (1L, Array(1f, 0.01f)),
      (2L, Array(0.99f, 0f)), // cos(1,2) ≈ 1 → removed (1 survives)
      (3L, Array(0.01f, 1f)), // alone in cluster 2
      (4L, Array(0.7f, -0.7f)) // cluster 1, cos vs 1/2 ≈ 0.7 < 0.9 → kept
    ).toDF("vec_id", "embedding")
    val cents = Seq((10L, Array(1f, 0f)), (20L, Array(0f, 1f))).toDF("cluster_id", "centroid")
    val got = Dedup
      .semanticDedup(emb, cents, threshold = 0.9)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2))))
      .toMap
    assert(got(1L) == ((10L, true)))
    assert(got(2L) == ((10L, false)))
    assert(got(3L) == ((20L, true)))
    assert(got(4L) == ((10L, true)))
  }

  test("sourceVocabDrift: mirror source → 0 bp, disjoint-vocab source → high bp") {
    // s1+s2 share the corpus mix exactly when they are identical; s3 is
    // disjoint. N = 12: s1 "a b", s2 "a b", s3 "x y" → each n_s = 2? Use
    // heavier counts for a non-trivial check.
    val df = Seq(
      (1L, "s1", "a b a b"),
      (2L, "s2", "a b a b"),
      (3L, "s3", "x y x y")
    ).toDF("doc_id", "source", "text")
    val drift = TextAnalysis.sourceVocabDrift(df).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    // corpus: a=4,b=4,x=2,y=2, N=12. s1: p(a)=p(b)=1/2 vs corpus 1/3 each;
    // TV = (|1/2-1/3|·2 + (1/6+1/6))/2 = 1/3 → 3333 bp
    assert(drift("s1") == 3333L && drift("s2") == 3333L)
    // s3: p(x)=p(y)=1/2 vs corpus 1/6 → TV = (2·1/3 + 2/3)/2 = 2/3 → 6666 bp
    assert(drift("s3") == 6666L)
  }

  test("qualityPercentile: strictly-less share per source, ties share a percentile") {
    // single-word docs: quality = 2·1 − 3·stop + 0.05·len
    // "zz" → 2 + 0.1 = 2.1 ; "the" → 2 − 3 + 0.15 = −0.85 ; "a" → 2 − 3 + 0.05 = −0.95
    val df = Seq(
      (1L, "s1", "a"), (2L, "s1", "the"), (3L, "s1", "zz"), (4L, "s1", "zz"),
      (5L, "s2", "zz")
    ).toDF("doc_id", "source", "text")
    val got = TextAnalysis.qualityPercentile(df).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    // s1: n=4; a:0 less → 0; the:1 less → 3333; zz,zz: 2 less → 6666 each
    assert(got(1L) == 0L && got(2L) == 3333L)
    assert(got(3L) == 6666L && got(4L) == 6666L)
    // s2 singleton: 0 less over max(n−1,1)=1 → 0
    assert(got(5L) == 0L)
  }

  test("multi-probe LSH candidates are a superset of single-probe at the same bands") {
    val emb = graft.sources.Tables.embeddings(spark, sf0001)
    val proj = emb.filter(col("vec_id") < 16)
      .select(col("vec_id").cast("int").as("pid"), col("embedding").as("pvec"))
    val single = Dedup.cosineLshPairs(emb, proj, threshold = 0.35)
      .select("id_a", "id_b")
    val multi = Dedup.cosineLshPairs(emb, proj, threshold = 0.35, probeBits = 8)
      .select("id_a", "id_b")
    assert(single.exceptAll(multi).isEmpty, "single-probe pair missing under multi-probe")
    assert(multi.count() >= single.count())
  }

  test("keepBestInGroup: survivor is max quality, ties to smaller id") {
    val groups = Seq((1L, 1L), (2L, 1L), (3L, 1L), (5L, 5L), (6L, 5L))
      .toDF("doc_id", "group_id")
    val quality = Seq((1L, 10L), (2L, 30L), (3L, 30L), (5L, 7L), (6L, 7L))
      .toDF("doc_id", "q")
    val kept = Dedup.keepBestInGroup(groups, quality).collect()
      .map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(kept == Map(1L -> false, 2L -> true, 3L -> false, 5L -> true, 6L -> false))
  }

  test("shuffleRank equals the global-sort row_number on the sf0.001 corpus") {
    val docs = graft.sources.Tables.documents(spark, sf0001)
    val got = Sampling.shuffleRank(docs, buckets = 8)
    val key = TextAnalysis.tokenHash(md5(col("text").cast("binary")))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(key.asc, col("doc_id").asc)
    val ref = docs.select(col("doc_id"), row_number().over(w).cast("long").as("shuffle_rank"))
    assert(got.exceptAll(ref).isEmpty && ref.exceptAll(got).isEmpty)
  }

  test("Funnel.steps strict ordering: later step requires an event after the previous step") {
    import java.sql.Timestamp
    def ts(m: Int) = Timestamp.valueOf(f"2026-01-01 00:$m%02d:00")
    val ev = Seq(
      // user 1 completes the funnel in order
      (1L, 1L, "view", ts(1)), (2L, 1L, "click", ts(2)), (3L, 1L, "purchase", ts(3)),
      // user 2: purchase BEFORE click → stops at click
      (4L, 2L, "view", ts(1)), (5L, 2L, "purchase", ts(2)), (6L, 2L, "click", ts(3)),
      // user 3: only view
      (7L, 3L, "view", ts(5))
    ).toDF("event_id", "user_id", "event_type", "ts")
    val got = Funnel.steps(ev, Seq("view", "click", "purchase")).collect()
      .map(r => r.getInt(1) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(got(1) == ((3L, 10000L)))
    assert(got(2) == ((2L, 6666L)))
    assert(got(3) == ((1L, 3333L)))
  }
}
