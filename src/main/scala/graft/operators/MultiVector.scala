package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Late-interaction multi-vector search (the ColBERT MaxSim family) — the
  * retrieval shape token-level embedding models need and single-vector
  * engines (the reference included) cannot express: a document is a BAG of
  * vectors, and score(q, d) = Σ over query vectors of the MAX similarity
  * any document vector reaches.
  *
  * Determinism contract: per-pair similarity rounds at `roundDist` BEFORE
  * the max (max of rounded values is order-free); the per-query sum runs
  * in DECIMAL so partial-aggregation order can never flip a ranking.
  *
  * Scale shape: the query bag (nq × vectors-per-query rows, bounded like
  * every query frame) broadcasts into one scan of the document-vector
  * table; both aggregations (max per (query-vector, doc), sum per
  * (query, doc)) are algebraic with map-side partials, and the final top-k
  * rides the bounded heap. Exhaustive over documents by construction — at
  * corpus scale the standard composition retrieves per-query-vector ANN
  * candidates first (the retrieveRerank pattern) and runs this exact
  * MaxSim only on the bounded union.
  */
object MultiVector {

  def maxSimKnn(
      queries: DataFrame, // (qid, qvec_id, qvec) — the query's vector bag
      base: DataFrame, // (did, bvec_id, vec) — document vector bags
      k: Int,
      roundDist: Option[Int] = Some(4)
  ): DataFrame = {
    val raw = graft.functions.VectorFunctions.dot(col("qvec"), col("vec"))
    val sim = roundDist.map(n => round(raw, n)).getOrElse(raw)
    val maxPer = broadcast(queries)
      .crossJoin(base)
      .select(col("qid"), col("qvec_id"), col("did"), sim.as("_s"))
      .groupBy(col("qid"), col("qvec_id"), col("did"))
      .agg(max(col("_s")).as("_m"))
    val scored = maxPer
      .groupBy(col("qid"), col("did"))
      .agg(round(sum(col("_m").cast("decimal(28,4)")).cast("double"), 4).as("dist"))
      .select(col("qid"), col("did").as("nid"), col("dist"))
    BruteForce.topK(scored, k, ascending = false)
  }
}
