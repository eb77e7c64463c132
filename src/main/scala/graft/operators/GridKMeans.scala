package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Oracle-expressible k-means-trained IVF — the deterministic twin of the
  * reference's Train→Add→Search path (`src/index/ivf/ivf.cc:440-654`, which
  * delegates to faiss `Clustering`), restated so BOTH engines can compute
  * the identical result: vectors are quantized to an exact integer grid
  * (round(v·10⁴), exact because a float's 24-bit mantissa times 10⁴ still
  * fits a double), and every Lloyd step — assignment by integer L2²,
  * centroid update by half-up integer mean — is pure 64-bit arithmetic.
  * No float accumulates anywhere, so partition order, engine, and libm
  * version cannot move a centroid by an ulp.
  *
  * This is the hash-gated arm of V2 Train; [[LocalKMeans]] (driver-local
  * float Lloyd over a bounded sample, the faiss `max_points_per_centroid`
  * contract) remains the production trainer, recall-gated in ScalaTest —
  * its float arithmetic is exactly what a SQL oracle cannot restate.
  *
  * Scale shape: each Lloyd round is one broadcast-assignment scan (the
  * centroid set is a collected literal, bounded by nb/stride like every
  * probe-list collect in the IVF family) plus one partially-aggregated
  * (cluster, dim)-keyed shuffle of long pairs — the distributed-k-means
  * shape MLlib itself uses; iterations are a fixed small constant.
  */
object GridKMeans {

  val Scale = 10000L

  /** Quantize a float vector to the exact integer grid (×10⁴, half-up).
    * The product float·10⁴ is exactly representable in double, so the
    * round is unambiguous and engine-independent. */
  def gridVec(vec: Column): Column =
    transform(vec, x => round(x.cast("double") * Scale).cast("long"))

  /** Integer L2² between a gridded vector column and a literal centroid —
    * the codegen'd [[graft.plans.VecL2SqLong]] kernel (a tight JIT'd long
    * loop; the interpreted `aggregate(zip_with(...))` formulation cost
    * ~10× on the assignment scan). */
  private def gdistLit(gv: Column, c: Array[Long]): Column = {
    import org.apache.spark.sql.GraftExpr
    GraftExpr.column(graft.plans.VecL2SqLong(
      GraftExpr.expression(gv), GraftExpr.expression(typedLit(c.toSeq))))
  }

  /** Integer L2² between two gridded vector columns. */
  private def gdist(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftExpr
    GraftExpr.column(graft.plans.VecL2SqLong(
      GraftExpr.expression(a), GraftExpr.expression(b)))
  }

  /** Nearest-centroid id for a gridded vector column. `cents` is sorted by
    * cluster id, and `array_position` returns the FIRST index of the min,
    * so ties break to the smallest cluster id — the same (dist, cid)
    * order the oracle's row_number states. */
  private def assignCol(gv: Column, cents: Seq[(Long, Array[Long])]): Column = {
    val dists = array(cents.map { case (_, c) => gdistLit(gv, c) }: _*)
    element_at(
      typedLit(cents.map(_._1)),
      array_position(dists, array_min(dists)).cast("int"))
  }

  private def halfUpMean(s: Long, n: Long): Long = {
    val q = (2L * math.abs(s) + n) / (2L * n)
    if (s < 0) -q else q
  }

  /** `iters` Lloyd rounds from every-`stride`-th-row seeds (cluster id =
    * seed row id). Returns the trained gridded centroids, driver-side
    * (bounded by nb/stride × dim — the same bounded-collect convention as
    * the IVF probe lists). Clusters that lose all members simply drop out
    * (k is an upper bound, as in faiss clustering). */
  def train(
      base: DataFrame, // (id, vec ARRAY<FLOAT>)
      stride: Long,
      iters: Int
  ): Seq[(Long, Array[Long])] = {
    val g = base.select(col("id"), gridVec(col("vec")).as("gv"))
    var cents: Seq[(Long, Array[Long])] = g
      .filter(col("id") % stride === 0)
      .select(col("id"), col("gv"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toArray)
      .sortBy(_._1)
      .toSeq
    require(cents.nonEmpty, s"no seed rows at stride $stride")
    for (_ <- 1 to iters) {
      val sums = g
        .select(assignCol(col("gv"), cents).as("cluster"), posexplode(col("gv")))
        .groupBy(col("cluster"), col("pos"))
        .agg(sum(col("col")).as("s"), count(lit(1)).as("n"))
        .collect() // ≤ k·dim rows
      cents = sums
        .groupBy(_.getLong(0))
        .map { case (cid, rows) =>
          val byPos = rows.sortBy(_.getInt(1))
          cid -> byPos.map(r => halfUpMean(r.getLong(2), r.getLong(3))).toArray
        }
        .toSeq
        .sortBy(_._1)
    }
    cents
  }

  /** Probed IVF search over the gridded domain: per query, the `nprobe`
    * nearest trained centroids (integer dist, ties to smaller cid) select
    * the lists; candidates rescore with the exact integer L2² and rank by
    * (dist, nid). Output dist IS the grid L2² (a BIGINT) — exact on both
    * engines by construction. */
  def search(
      queries: DataFrame, // (qid, qvec ARRAY<FLOAT>)
      base: DataFrame, // (id, vec ARRAY<FLOAT>)
      cents: Seq[(Long, Array[Long])],
      k: Int,
      nprobe: Int
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = queries.sparkSession
    import spark.implicits._
    val gq = queries.select(col("qid"), gridVec(col("qvec")).as("gq"))
    val centDf = cents.map { case (cid, c) => (cid, c.toSeq) }.toDF("cluster", "cent")
    val probes = gq
      .crossJoin(broadcast(centDf))
      .select(col("qid"), col("gq"), col("cluster"),
        gdist(col("gq"), col("cent")).as("d"))
      .withColumn("rn",
        row_number().over(
          Window.partitionBy(col("qid")).orderBy(col("d").asc, col("cluster").asc)))
      .filter(col("rn") <= nprobe)
      .select(col("qid"), col("gq"), col("cluster"))
    // bind gv FIRST: referenced by every per-centroid distance, an inline
    // gridVec would re-run the quantization transform once per centroid
    val assigned = base
      .select(col("id"), gridVec(col("vec")).as("gv"))
      .select(col("id"), col("gv"), assignCol(col("gv"), cents).as("cluster"))
    broadcast(probes)
      .join(assigned, "cluster")
      .select(col("qid"), col("id").as("nid"), gdist(col("gq"), col("gv")).as("dist"))
      .withColumn("rnk",
        row_number().over(
          Window.partitionBy(col("qid")).orderBy(col("dist").asc, col("nid").asc)))
      .filter(col("rnk") <= k)
      .select(col("qid"), col("nid"), col("dist"), col("rnk"))
  }
}
