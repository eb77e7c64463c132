package graft

import org.apache.spark.sql.functions._

import graft.operators.{BruteForce, Metric}
import graft.sources.Tables

class BruteForceSpec extends SparkSpec {
  import spark.implicits._

  private lazy val base = Seq(
    (0L, Array(0f, 0f)),
    (1L, Array(1f, 0f)),
    (2L, Array(0f, 2f)),
    (3L, Array(3f, 0f)),
    (4L, Array(1f, 0f)) // tie with id 1 at L2 from origin
  ).toDF("id", "vec")

  private lazy val queries = Seq((100L, Array(0f, 0f))).toDF("qid", "qvec")

  test("knn L2 orders by distance then id (tie-break)") {
    val got = BruteForce
      .knn(queries, base, 3, Metric.L2)
      .orderBy("rnk")
      .collect()
      .map(r => (r.getAs[Long]("nid"), r.getAs[Int]("rnk")))
    assert(got.toSeq == Seq((0L, 1), (1L, 2), (4L, 3))) // tie 1 vs 4 → lower id first
  }

  test("knn IP orders descending") {
    val got = BruteForce
      .knn(Seq((1L, Array(1f, 1f))).toDF("qid", "qvec"), base, 2, Metric.IP)
      .orderBy("rnk")
      .collect()
      .map(_.getAs[Long]("nid"))
    assert(got.toSeq == Seq(3L, 2L)) // ip: 3, 2
  }

  test("baseFilter excludes filtered-out rows (BitsetView semantics)") {
    val got = BruteForce
      .knn(queries, base, 3, Metric.L2, baseFilter = Some(col("id") =!= 0L))
      .collect()
      .map(_.getAs[Long]("nid"))
    assert(!got.contains(0L))
  }

  test("knnFused is row-identical to declarative knn (all metrics, ties, rounding)") {
    val q = Tables
      .embeddings(spark, sf0001)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val b = Tables
      .embeddings(spark, sf0001)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    for (m <- Seq(Metric.L2, Metric.L2Sq, Metric.IP, Metric.Cosine)) {
      val slow = BruteForce
        .topK(
          BruteForce.pairs(q, b, m, roundDist = Some(4)).filter(col("qid") =!= col("nid")),
          5, m.ascending)
        .orderBy("qid", "rnk").collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      val fast = BruteForce
        .knnFused(q, b, 5, m, roundDist = Some(4), excludeSelf = true)
        .orderBy("qid", "rnk").collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      assert(fast.toSeq == slow.toSeq, s"metric ${m.name}")
    }
  }

  test("range search respects two-sided bound [rangeFilter, radius)") {
    val got = BruteForce
      .rangeSearch(queries, base, Metric.L2, radius = 3.0, rangeFilter = 1.0)
      .collect()
      .map(_.getAs[Long]("nid"))
      .toSet
    // dist: id0=0, id1=1, id2=2, id3=3, id4=1 → keep 1 <= d < 3 → {1,2,4}
    assert(got == Set(1L, 2L, 4L))
  }

  test("similarity range search inverts the bound (radius, rangeFilter]") {
    val got = BruteForce
      .rangeSearch(
        Seq((1L, Array(1f, 0f))).toDF("qid", "qvec"),
        base, Metric.IP, radius = 0.5, rangeFilter = 10.0)
      .collect()
      .map(_.getAs[Long]("nid"))
      .toSet
    // ip: id0=0, id1=1, id2=0, id3=3, id4=1 → keep 0.5 < ip <= 10 → {1,3,4}
    assert(got == Set(1L, 3L, 4L))
  }

  test("knnPadded fills missing slots with id -1 and null distance") {
    // base filter leaves only ids {1, 4}: slots 3..5 must pad with -1
    val got = BruteForce
      .knnPadded(queries, base, 5, Metric.L2, baseFilter = Some(col("id") % 3 === 1))
      .orderBy("rnk")
      .collect()
      .map(r => (r.getAs[Long]("nid"), r.isNullAt(r.fieldIndex("dist")), r.getAs[Int]("rnk")))
    assert(got.length == 5) // fixed nq×k shape
    assert(got.take(2).toSeq == Seq((1L, false, 1), (4L, false, 2)))
    assert(got.drop(2).forall { case (nid, distNull, _) => nid == -1L && distNull })
  }

  test("getVectorByIds returns exactly the requested rows") {
    val ids = Seq(1L, 3L).toDF("id")
    val got = BruteForce.getVectorByIds(ids, base).collect()
    assert(got.map(_.getAs[Long]("id")).toSet == Set(1L, 3L))
    assert(got.length == 2)
  }
}
