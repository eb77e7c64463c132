package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.{Cohort, Dedup, TextAnalysis}

/** Cohort retention / attribution laws on a hand-built event frame, plus
  * the repetition-run, winnowing and minhash-calibration text operators.
  */
class CohortSpec extends SparkSpec {

  import spark.implicits._

  private def ts(day: Int, hour: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-${day + 1}%02d $hour%02d:00:00")

  // (event_id, ts, user_id, event_type, value)
  private lazy val events = Seq(
    (1L, ts(0), 1L, "view", 1.0),
    (2L, ts(0, 2), 1L, "click", 2.0),
    (3L, ts(2), 1L, "purchase", 10.0),
    (4L, ts(0), 2L, "view", 1.0),
    (5L, ts(1), 2L, "purchase", 20.0),
    (6L, ts(3), 3L, "purchase", 5.0) // no touch at all
  ).toDF("event_id", "ts", "user_id", "event_type", "value")

  test("retention: offset 0 is the full cohort; counts follow activity days") {
    val r = Cohort.retention(events).collect()
      .map(x => (x.getInt(0), x.getInt(1)) -> (x.getLong(2), x.getLong(3), x.getLong(4))).toMap
    // users 1,2 share cohort day 0 (2024-01-01); user 3 cohorts on day 3
    val day0 = r.keys.map(_._1).min
    assert(r((day0, 0)) == (2L, 2L, 10000L))
    assert(r((day0, 1)) == (1L, 2L, 5000L)) // user 2 active on day 1
    assert(r((day0, 2)) == (1L, 2L, 5000L)) // user 1 active on day 2
    assert(r((day0 + 3, 0)) == (1L, 1L, 10000L))
  }

  test("attribution: first-touch credits the earliest touch, last-touch the latest") {
    val first = Cohort.attribution(events, "purchase", Seq("view", "click"), first = true)
      .collect().map(x => x.getString(0) -> (x.getLong(1), x.getDouble(2))).toMap
    // user 1's first touch is the view; user 2's only touch is a view;
    // user 3 has none
    assert(first("view") == (2L, 30.0))
    assert(first("none") == (1L, 5.0))
    assert(!first.contains("click"))
    val last = Cohort.attribution(events, "purchase", Seq("view", "click"), first = false)
      .collect().map(x => x.getString(0) -> (x.getLong(1), x.getDouble(2))).toMap
    // user 1's latest touch before the purchase is the click
    assert(last("click") == (1L, 10.0))
    assert(last("view") == (1L, 20.0))
    assert(last("none") == (1L, 5.0))
  }

  test("maxTokenRun finds the longest identical-consecutive-token run") {
    val docs = Seq(
      (1L, "a a a b b"),
      (2L, "x y x y"),
      (3L, "z")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.maxTokenRun(docs).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == Map(1L -> 3, 2L -> 1, 3L -> 1))
  }

  test("winnowing: docs sharing a >= n+w-1 token run share a fingerprint") {
    val run = "alpha beta gamma delta epsilon zeta" // 6 tokens = n+w-1 with n=3, w=4
    val docs = Seq(
      (1L, s"one two $run three"),
      (2L, s"$run nine ten eleven")
    ).toDF("doc_id", "text")
    val fps = TextAnalysis.winnowingFingerprints(docs)
    val a = fps.filter(col("doc_id") === 1L).select("fp").collect().map(_.getLong(0)).toSet
    val b = fps.filter(col("doc_id") === 2L).select("fp").collect().map(_.getLong(0)).toSet
    assert(a.intersect(b).nonEmpty)
    // disjoint texts share nothing
    val other = TextAnalysis
      .winnowingFingerprints(Seq((3L, "p q r s t u v w")).toDF("doc_id", "text"))
      .select("fp").collect().map(_.getLong(0)).toSet
    assert(a.intersect(other).isEmpty)
  }

  test("shingle novelty: the first doc owns everything; shares stay in [0, 10000]") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta epsilon"), // full copy: novelty 0
      (3L, "alpha beta gamma zeta eta theta") // partial overlap
    ).toDF("doc_id", "text")
    val r = Dedup.shingleNovelty(docs).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2), x.getLong(3))).toMap
    assert(r(1L)._3 == 10000L)
    assert(r(2L)._3 == 0L)
    assert(r(3L)._3 > 0L && r(3L)._3 < 10000L)
    r.values.foreach { case (tot, nov, bp) =>
      assert(nov <= tot && bp >= 0L && bp <= 10000L)
    }
  }

  test("vocab growth: cumulative is monotone and ends at the distinct n-gram count") {
    val docs = graft.sources.Tables.documents(spark, sf0001)
    val rows = TextAnalysis.vocabGrowth(docs).orderBy("bucket").collect()
    val cums = rows.map(_.getLong(2))
    assert(cums.zip(cums.drop(1)).forall { case (a, b) => a <= b })
    val distinct = docs
      .select(explode(array_distinct(
        TextAnalysis.shingles(TextAnalysis.tokens(col("text")), 3))).as("g"))
      .agg(countDistinct(col("g"))).head().getLong(0)
    assert(cums.last == distinct)
    assert(rows.map(_.getLong(1)).sum == distinct)
  }

  test("salted join equals the plain join for every salt width") {
    val probe = Seq((1L, 10L, "a"), (2L, 10L, "b"), (3L, 10L, "c"), (4L, 20L, "d"))
      .toDF("event_id", "user_id", "tag")
    val build = Seq((10L, 100L), (20L, 200L), (30L, 300L)).toDF("user_id", "payload")
    val plain = probe.join(build, "user_id")
    for (s <- Seq(1, 3, 8)) {
      val salted = graft.operators.Skew
        .saltedJoin(probe, build, "user_id", col("event_id"), salts = s)
        .select(plain.columns.map(col): _*)
      assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty,
        s"salts=$s diverged from the plain join")
    }
  }

  test("minhash calibration: identical docs estimate 10000 bp with zero error") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again"),
      (2L, "the quick brown fox jumps over the lazy dog again"),
      (3L, "completely different words entirely here nothing shared at all")
    ).toDF("doc_id", "text")
    val rows = Dedup.minhashAccuracy(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(rows((1L, 2L)) == (10000L, 10000L, 0L))
    rows.values.foreach { case (est, jac, err) =>
      assert(est >= 0L && est <= 10000L && jac >= 0L && jac <= 10000L && err >= 0L)
    }
  }
}
