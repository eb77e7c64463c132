package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** SQ8 scalar quantization + two-phase refine search — the Spark rendering of
  * the reference's IVF_SQ8 quantizer and the SCANN `reorder_k` raw-data
  * rerank pattern (`src/index/ivf/ivf.cc:774-788`, refine
  * `include/knowhere/index/index_node.h:538-567`).
  *
  * Train: per-dimension min/max over the base ("stats" = the quantizer
  * model, a single broadcastable row). Encode: 8-bit code per dim. Search:
  * asymmetric approx distance (exact query vs reconstructed code midpoint),
  * top-`reorderK` candidates, then exact rerank to top-k — a 4x-smaller scan
  * payload at 100 TB, with the raw-vector read deferred to reorderK rows per
  * query.
  */
object Quantization {

  /** Quantizer model: one row `(mn ARRAY<DOUBLE>, mx ARRAY<DOUBLE>)` of
    * per-dim bounds (TRAIN phase of IVF_SQ8, `ivf.cc:440-654`). */
  def sq8Train(base: DataFrame, vecCol: String = "vec"): DataFrame = {
    val exploded = base
      .select(posexplode(col(vecCol)).as(Seq("i", "x")))
      .groupBy(col("i"))
      .agg(min(col("x").cast("double")).as("mn"), max(col("x").cast("double")).as("mx"))
    exploded
      .groupBy()
      .agg(
        array_sort(collect_list(struct(col("i"), col("mn"), col("mx")))).as("s"))
      .select(
        transform(col("s"), e => e.getField("mn")).as("mn"),
        transform(col("s"), e => e.getField("mx")).as("mx"))
  }

  /** 8-bit code per dim: floor((x−mn)/(mx−mn)·255) clamped to [0,255]. */
  def sq8Code(vec: Column, mn: Column, mx: Column): Column =
    zip_with(
      vec,
      zip_with(mn, mx, (a, b) => struct(a.as("mn"), b.as("mx"))),
      (x, s) => {
        val span = s.getField("mx") - s.getField("mn")
        val c = when(span === 0.0d, lit(0.0d))
          .otherwise(floor((x.cast("double") - s.getField("mn")) / span * 255.0d))
        least(lit(255.0d), greatest(lit(0.0d), c)).cast("int")
      }
    )

  /** Reconstructed value: mn + (code+0.5)·(mx−mn)/255 (faiss SQ midpoint). */
  def sq8Recon(code: Column, mn: Column, mx: Column): Column =
    zip_with(
      code,
      zip_with(mn, mx, (a, b) => struct(a.as("mn"), b.as("mx"))),
      (c, s) =>
        s.getField("mn") + (c.cast("double") + 0.5d) * (s.getField("mx") - s.getField("mn")) / 255.0d
    )

  /** Two-phase SQ8 kNN: approx (quantized) top-reorderK → exact rerank
    * top-k. Output (qid, nid, dist, rnk) with exact distances.
    *
    * Scale shape: `stats` is one broadcast row; codes are computed map-side
    * over the base scan; only nq×reorderK candidate rows carry the raw
    * vector into the rerank.
    */
  def sq8Knn(
      queries: DataFrame, // (qid, qvec)
      base: DataFrame, // (id, vec)
      k: Int,
      reorderK: Int,
      roundDist: Option[Int] = None
  ): DataFrame = {
    val stats = sq8Train(base)
    val coded = base
      .crossJoin(broadcast(stats))
      .select(col("id"), col("vec"), sq8Recon(sq8Code(col("vec"), col("mn"), col("mx")), col("mn"), col("mx")).as("recon"))
    val rawA = VectorFunctions.l2(col("qvec"), col("recon"))
    val adist = roundDist.map(n => round(rawA, n)).getOrElse(rawA)
    // rank on (qid, nid, dist) only; raw vectors rejoin for the rerank so
    // they never ride through the top-k shuffle
    val cand = BruteForce
      .topK(
        broadcast(queries)
          .crossJoin(coded)
          .select(col("qid"), col("id").as("nid"), adist.as("dist")),
        reorderK,
        ascending = true)
      .join(broadcast(queries), "qid")
      .join(base.select(col("id").as("nid"), col("vec")), "nid")
    val rawE = VectorFunctions.l2(col("qvec"), col("vec"))
    val edist = roundDist.map(n => round(rawE, n)).getOrElse(rawE)
    BruteForce.topK(
      cand.select(col("qid"), col("nid"), edist.as("dist")),
      k,
      ascending = true
    )
  }
}
