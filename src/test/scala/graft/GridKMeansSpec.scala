package graft

import org.apache.spark.sql.functions._

import graft.operators.{BruteForce, GridKMeans, Metric}
import graft.sources.Tables

class GridKMeansSpec extends SparkSpec {

  test("train: well-separated clusters converge to exact integer means") {
    import spark.implicits._
    // two tight clusters around (0,0) and (10,10); seeds = ids 0 and 4
    // (stride 4) start one in each cluster
    val pts = Seq(
      (0L, Seq(0.0f, 0.1f)),
      (1L, Seq(0.1f, 0.0f)),
      (2L, Seq(0.2f, 0.2f)),
      (4L, Seq(10.0f, 10.1f)),
      (5L, Seq(10.1f, 10.0f)),
      (6L, Seq(9.9f, 9.9f))
    ).toDF("id", "vec")
    val cents = GridKMeans.train(pts, stride = 4L, iters = 2)
    assert(cents.map(_._1) == Seq(0L, 4L))
    // half-up integer means on the 1e4 grid: (0+1000+2000)/3=1000,
    // (1000+0+2000)/3=1000; (100000+101000+99000)/3=100000, sym.
    assert(cents(0)._2.toSeq == Seq(1000L, 1000L))
    assert(cents(1)._2.toSeq == Seq(100000L, 100000L))
  }

  test("search: probing every list equals the exact grid-distance top-k") {
    val base = Tables
      .embeddings(spark, sf0001)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val queries = Tables
      .embeddings(spark, sf0001)
      .filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val cents = GridKMeans.train(base, stride = 250L, iters = 2)
    val got = GridKMeans
      .search(queries, base, cents, k = 10, nprobe = cents.length)
      .select("qid", "nid", "rnk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // exact reference: integer grid L2² over all pairs, rank (dist, nid)
    import org.apache.spark.sql.expressions.Window
    val gq = queries.select(col("qid"), GridKMeans.gridVec(col("qvec")).as("gq"))
    val gb = base.select(col("id").as("nid"), GridKMeans.gridVec(col("vec")).as("gv"))
    val exact = gq.crossJoin(gb)
      .select(col("qid"), col("nid"),
        aggregate(zip_with(col("gq"), col("gv"), (a, b) => (a - b) * (a - b)),
          lit(0L), _ + _).as("dist"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("dist").asc, col("nid").asc)))
      .filter(col("rnk") <= 10)
      .select("qid", "nid", "rnk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == exact)
  }

  test("train is layout-independent: any partitioning yields identical centroids") {
    val base = Tables
      .embeddings(spark, sf0001)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val c1 = GridKMeans.train(base, stride = 250L, iters = 2)
    val c2 = GridKMeans.train(base.repartition(17), stride = 250L, iters = 2)
    assert(c1.map(_._1) == c2.map(_._1))
    c1.zip(c2).foreach { case ((id, a), (_, b)) =>
      assert(a.sameElements(b), s"centroid $id differs across partitionings")
    }
  }

  test("search: partial probes keep ANN-floor recall vs the grid ground truth") {
    val base = Tables
      .embeddings(spark, sf0001)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val queries = Tables
      .embeddings(spark, sf0001)
      .filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val cents = GridKMeans.train(base, stride = 250L, iters = 2)
    val ann = GridKMeans.search(queries, base, cents, k = 10, nprobe = 1)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = GridKMeans.search(queries, base, cents, k = 10, nprobe = cents.length)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = ann.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.5, s"nprobe=1 recall $recall below ANN floor")
  }
}
