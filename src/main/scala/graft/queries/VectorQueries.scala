package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._
import graft.operators._
import graft.sources.Tables

/** Vector-search operator queries (SURVEY.md §2.2) with DuckDB oracles.
  *
  * Determinism contract shared with the oracles: distances in DOUBLE with a
  * left-to-right element fold, rounded to 4dp BEFORE ranking, ties broken by
  * neighbor id — the reference compares result sets at equal distance
  * (`tests/ut/utils.h:110-134`), so tie ORDER is ours to pin down.
  */
object VectorQueries {

  private[queries] val QMOD = 100 // every 100th vector is a query
  private[queries] val K = 10
  private[queries] val ROUND: Option[Int] = Some(4)

  private[queries] def queryVecs(spark: SparkSession, dir: String): DataFrame =
    Tables
      .embeddings(spark, dir)
      .filter(col("vec_id") % QMOD === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))

  private[queries] def baseVecs(spark: SparkSession, dir: String): DataFrame =
    Tables
      .embeddings(spark, dir)
      .select(col("vec_id").as("id"), col("embedding").as("vec"), col("label"))

  // ---------------------------------------------------------------- oracle SQL
  private[queries] object Sql {
    val qView =
      s"q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id % $QMOD = 0)"
    val l2 =
      "round(sqrt(list_sum(list_transform(range(1, len(q.qv)+1), i -> " +
        "(CAST(q.qv[i] AS DOUBLE) - CAST(b.embedding[i] AS DOUBLE)) * " +
        "(CAST(q.qv[i] AS DOUBLE) - CAST(b.embedding[i] AS DOUBLE))))), 4)"
    val ip =
      "round(list_sum(list_transform(range(1, len(q.qv)+1), i -> " +
        "CAST(q.qv[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))), 4)"
    def norm(v: String): String =
      s"sqrt(list_sum(list_transform($v, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
    val cosine =
      "round(list_sum(list_transform(range(1, len(q.qv)+1), i -> " +
        "CAST(q.qv[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))) / (" +
        norm("q.qv") + " * " + norm("b.embedding") + "), 4)"
    val hamming =
      "CAST(list_sum(list_transform(range(1, len(q.qv)+1), i -> " +
        "CASE WHEN (q.qv[i] > 0) <> (b.embedding[i] > 0) THEN 1 ELSE 0 END)) AS DOUBLE)"
    val jaccard =
      "round(CASE WHEN list_sum(list_transform(range(1, len(q.qv)+1), i -> " +
        "CASE WHEN (q.qv[i] > 0) OR (b.embedding[i] > 0) THEN 1 ELSE 0 END)) = 0 THEN 0.0 " +
        "ELSE 1.0 - CAST(list_sum(list_transform(range(1, len(q.qv)+1), i -> " +
        "CASE WHEN (q.qv[i] > 0) AND (b.embedding[i] > 0) THEN 1 ELSE 0 END)) AS DOUBLE) / " +
        "list_sum(list_transform(range(1, len(q.qv)+1), i -> " +
        "CASE WHEN (q.qv[i] > 0) OR (b.embedding[i] > 0) THEN 1 ELSE 0 END)) END, 4)"

    // ---- reduced-precision storage casts (element-level, DuckDB) ----
    // fp16: round-to-nearest-even at 10 mantissa bits; subnormals below
    // 2^-14 on the fixed 2^-24 grid. bf16: 7 bits, fp32 exponent range.
    private def gridCast(mBits: Int, minNormalExp: Int): String = {
      val thr = s"pow(2, ${-minNormalExp})"
      val sub = s"pow(2, ${mBits + minNormalExp})"
      val scl = s"pow(2, $mBits - floor(log2(abs(CAST(x AS DOUBLE)))))"
      s"x -> CASE WHEN abs(CAST(x AS DOUBLE)) >= $thr " +
        s"THEN roundbankers(CAST(x AS DOUBLE) * $scl, 0) / $scl " +
        s"ELSE roundbankers(CAST(x AS DOUBLE) * $sub, 0) / $sub END"
    }
    val fp16Cast: String = gridCast(10, 14)
    val bf16Cast: String = gridCast(7, 126)
    val int8Cast: String =
      "x -> greatest(-128.0, least(127.0, roundbankers(CAST(x AS DOUBLE) * 100.0, 0))) / 100.0"

    val l2Cast =
      "round(sqrt(list_sum(list_transform(range(1, len(q.qv)+1), i -> " +
        "(q.qv[i] - b.bv[i]) * (q.qv[i] - b.bv[i])))), 4)"
    val ipCast =
      "round(list_sum(list_transform(range(1, len(q.qv)+1), i -> q.qv[i] * b.bv[i])), 4)"

    /** knn over storage-cast vectors on BOTH sides. */
    def castKnn(cast: String, desc: Boolean, distExpr: String, k: Int = K): String = {
      val ord = if (desc) "dist DESC, nid ASC" else "dist ASC, nid ASC"
      s"""WITH qf AS (
  SELECT vec_id AS qid, list_transform(embedding, $cast) AS qv
  FROM embeddings WHERE vec_id % $QMOD = 0
),
bf AS (SELECT vec_id, list_transform(embedding, $cast) AS bv FROM embeddings),
pairs AS (
  SELECT q.qid AS qid, b.vec_id AS nid, $distExpr AS dist
  FROM qf q CROSS JOIN bf b
)
SELECT qid, nid, dist, rnk FROM (
  SELECT qid, nid, dist,
         CAST(row_number() OVER (PARTITION BY qid ORDER BY $ord) AS INT) AS rnk
  FROM pairs
) WHERE rnk <= $k"""
    }

    /** PQ ADC + exact rerank with the DETERMINISTIC every-25th-vector
      * codebook (m=8, ksub=16, dsub=8): encode = per-subspace argmin with
      * (d, c) tie-break (= Spark's first-minimum `array_position`); ADC =
      * ordered per-subspace fold (list ORDER BY s — matches the Spark
      * left-to-right reduce); rerank = exact L2 on the top-50. `probed`
      * adds the explicit-centroid IVF assignment + top-2 probe CTEs. */
    def pqKnn(probed: Boolean, k: Int = K): String = {
      def dExpr(vec: String, sRef: String): String =
        s"list_sum(list_transform(range(1, 9), j -> " +
          s"(CAST($vec[$sRef*8 + j] AS DOUBLE) - CAST(cb.cv[$sRef*8 + j] AS DOUBLE)) * " +
          s"(CAST($vec[$sRef*8 + j] AS DOUBLE) - CAST(cb.cv[$sRef*8 + j] AS DOUBLE))))"
      val ivfCtes = if (!probed) "" else s""",
cc AS (SELECT vec_id AS cid, embedding AS cv2 FROM embeddings WHERE vec_id % 250 = 0),
asn AS (
  SELECT vec_id, cid FROM (
    SELECT b.vec_id, cc.cid,
      row_number() OVER (PARTITION BY b.vec_id ORDER BY
        round(sqrt(list_sum(list_transform(range(1, len(b.embedding)+1), i ->
          (CAST(b.embedding[i] AS DOUBLE) - CAST(cc.cv2[i] AS DOUBLE)) *
          (CAST(b.embedding[i] AS DOUBLE) - CAST(cc.cv2[i] AS DOUBLE))))), 4) ASC, cc.cid ASC) AS rn
    FROM embeddings b CROSS JOIN cc
  ) WHERE rn = 1
),
probes AS (
  SELECT qid, cid FROM (
    SELECT q.qid, cc.cid,
      row_number() OVER (PARTITION BY q.qid ORDER BY
        round(sqrt(list_sum(list_transform(range(1, len(q.qv)+1), i ->
          (CAST(q.qv[i] AS DOUBLE) - CAST(cc.cv2[i] AS DOUBLE)) *
          (CAST(q.qv[i] AS DOUBLE) - CAST(cc.cv2[i] AS DOUBLE))))), 4) ASC, cc.cid ASC) AS rn
    FROM q CROSS JOIN cc
  ) WHERE rn <= 2
)"""
      val partsFrom =
        if (probed)
          "FROM q JOIN probes p ON p.qid = q.qid JOIN asn a ON a.cid = p.cid " +
            "JOIN enc e ON e.vec_id = a.vec_id JOIN cb ON cb.c = e.code"
        else "FROM q CROSS JOIN enc e JOIN cb ON cb.c = e.code"
      s"""WITH $qView$ivfCtes,
cb AS (SELECT CAST(vec_id // 25 AS INT) AS c, embedding AS cv FROM embeddings
       WHERE vec_id % 25 = 0 AND vec_id < 400),
enc AS (
  SELECT b.vec_id AS vec_id, s.s AS s, cb.c AS code
  FROM embeddings b
  CROSS JOIN (SELECT unnest(range(0, 8)) AS s) s
  CROSS JOIN cb
  QUALIFY row_number() OVER (PARTITION BY b.vec_id, s.s
    ORDER BY ${dExpr("b.embedding", "s.s")} ASC, cb.c ASC) = 1
),
parts AS (
  SELECT q.qid AS qid, e.vec_id AS nid, e.s AS s, ${dExpr("q.qv", "e.s")} AS part
  $partsFrom
),
adc AS (
  SELECT qid, nid, round(sqrt(list_sum(list(part ORDER BY s))), 4) AS adist
  FROM parts GROUP BY 1, 2
),
cand AS (
  SELECT qid, nid, row_number() OVER (PARTITION BY qid ORDER BY adist ASC, nid ASC) AS crnk
  FROM adc
),
rer AS (
  SELECT c2.qid AS qid, c2.nid AS nid, $l2 AS dist
  FROM cand c2 JOIN q ON q.qid = c2.qid JOIN embeddings b ON b.vec_id = c2.nid
  WHERE c2.crnk <= 50
)
SELECT qid, nid, dist, rnk FROM (
  SELECT qid, nid, dist,
         CAST(row_number() OVER (PARTITION BY qid ORDER BY dist ASC, nid ASC) AS INT) AS rnk
  FROM rer
) WHERE rnk <= $k"""
    }

    /** Iterator refine page: SQ8-recon approx ordering, over-fetched by
      * refineRatio, exact-reranked; page in exact order. */
    def iterRefine(page: Int, pageSize: Int, refineRatio: Int): String = {
      val fetch = page * pageSize * refineRatio
      s"""WITH $qView,
stats AS (
  SELECT CAST(r.range AS INT) AS i,
         min(CAST(b.embedding[CAST(r.range AS INT)] AS DOUBLE)) AS mn,
         max(CAST(b.embedding[CAST(r.range AS INT)] AS DOUBLE)) AS mx
  FROM embeddings b CROSS JOIN range(1, 65) r GROUP BY 1
),
sv AS (SELECT list(mn ORDER BY i) AS mn, list(mx ORDER BY i) AS mx FROM stats),
recon AS (
  SELECT b.vec_id, list_transform(range(1, len(b.embedding)+1), i ->
    s.mn[i] + (LEAST(255.0, GREATEST(0.0,
      CASE WHEN s.mx[i] = s.mn[i] THEN 0.0
           ELSE floor((CAST(b.embedding[i] AS DOUBLE) - s.mn[i]) / (s.mx[i] - s.mn[i]) * 255.0) END
    )) + 0.5) * (s.mx[i] - s.mn[i]) / 255.0) AS rv
  FROM embeddings b CROSS JOIN sv s
),
approx AS (
  SELECT qid, nid FROM (
    SELECT q.qid AS qid, r.vec_id AS nid,
      row_number() OVER (PARTITION BY q.qid ORDER BY
        round(sqrt(list_sum(list_transform(range(1, len(q.qv)+1), i ->
          (CAST(q.qv[i] AS DOUBLE) - r.rv[i]) * (CAST(q.qv[i] AS DOUBLE) - r.rv[i])))), 4) ASC,
        r.vec_id ASC) AS arnk
    FROM q CROSS JOIN recon r
  ) WHERE arnk <= $fetch
),
rer AS (
  SELECT a.qid AS qid, a.nid AS nid, $l2 AS dist
  FROM approx a JOIN q ON q.qid = a.qid JOIN embeddings b ON b.vec_id = a.nid
)
SELECT qid, nid, dist, rnk FROM (
  SELECT qid, nid, dist,
         CAST(row_number() OVER (PARTITION BY qid ORDER BY dist ASC, nid ASC) AS INT) AS rnk
  FROM rer
) WHERE rnk > ${(page - 1) * pageSize} AND rnk <= ${page * pageSize}"""
    }

    /** Two-hop beam search over the 5-NN graph, unrolled: frontier =
      * top-ef of frontier ∪ scored graph neighbors per hop (fixed
      * iteration count ⇒ plain SQL; mirrors GraphSearch.beamSearch).
      * `graphCtes` overrides the default exact-5NN graph CTE — it must
      * end in a CTE named `g` exposing (src, dst). */
    def graphBeam(ef: Int, k: Int, graphCtes: Option[String] = None,
        allowedPred: Option[String] = None,
        rangeBound: Option[(Double, Double)] = None): String = {
      def topEf(src: String): String =
        s"""SELECT qid, nid, dist FROM (
  SELECT qid, nid, dist, row_number() OVER (PARTITION BY qid ORDER BY dist ASC, nid ASC) AS rn
  FROM $src
) WHERE rn <= $ef"""
      val gCte = graphCtes.getOrElse(
        """g AS (
  SELECT src, dst FROM (
    SELECT a.vec_id AS src, b.vec_id AS dst,
      row_number() OVER (PARTITION BY a.vec_id ORDER BY
        round(sqrt(list_sum(list_transform(range(1, len(a.embedding)+1), i ->
          (CAST(a.embedding[i] AS DOUBLE) - CAST(b.embedding[i] AS DOUBLE)) *
          (CAST(a.embedding[i] AS DOUBLE) - CAST(b.embedding[i] AS DOUBLE))))), 4) ASC,
        b.vec_id ASC) AS rnk
    FROM embeddings a CROSS JOIN embeddings b WHERE a.vec_id <> b.vec_id
  ) WHERE rnk <= 5
)""")
      s"""WITH $qView,
$gCte,
e AS (SELECT vec_id AS nid FROM embeddings WHERE vec_id % 250 = 0),
s0 AS (
  SELECT q.qid AS qid, b.vec_id AS nid, $l2 AS dist
  FROM q CROSS JOIN e JOIN embeddings b ON b.vec_id = e.nid
),
f0 AS (${topEf("s0")}),
c1 AS (SELECT DISTINCT f.qid AS qid, g.dst AS nid FROM f0 f JOIN g ON g.src = f.nid),
s1 AS (
  SELECT c.qid AS qid, b.vec_id AS nid, $l2 AS dist
  FROM c1 c JOIN q ON q.qid = c.qid JOIN embeddings b ON b.vec_id = c.nid
),
u1 AS (SELECT DISTINCT qid, nid, dist FROM (SELECT * FROM f0 UNION ALL SELECT * FROM s1)),
f1 AS (${topEf("u1")}),
c2 AS (SELECT DISTINCT f.qid AS qid, g.dst AS nid FROM f1 f JOIN g ON g.src = f.nid),
s2 AS (
  SELECT c.qid AS qid, b.vec_id AS nid, $l2 AS dist
  FROM c2 c JOIN q ON q.qid = c.qid JOIN embeddings b ON b.vec_id = c.nid
),
u2 AS (SELECT DISTINCT qid, nid, dist FROM (SELECT * FROM f1 UNION ALL SELECT * FROM s2)),
f2 AS (${topEf("u2")}),
fin AS (${allowedPred.fold("SELECT qid, nid, dist FROM f2")(p =>
        s"SELECT f.qid, f.nid, f.dist FROM f2 f JOIN embeddings al ON al.vec_id = f.nid WHERE $p")})
${rangeBound.fold(
        s"""SELECT qid, nid, dist, rnk FROM (
  SELECT qid, nid, dist,
         CAST(row_number() OVER (PARTITION BY qid ORDER BY dist ASC, nid ASC) AS INT) AS rnk
  FROM fin
) WHERE rnk <= $k""") { case (rf, r) =>
        s"SELECT qid, nid, dist FROM fin WHERE dist >= $rf AND dist < $r" }}"""
    }

    /** CAGRA graph-optimization CTEs (mirrors Cagra.optimize): exact
      * interDegree-NN graph → detour prune (edge (s,d) dropped when some
      * s→m→d route has both legs strictly shorter) → reverse-edge merge →
      * re-cap at graphDegree. Ends in `g(src, dst, dist, rnk)` — plugs
      * into [[graphBeam]]'s graphCtes slot. `ivfBucketed` swaps the
      * all-pairs intermediate graph for the IVF-bucketed candidate build
      * (deterministic vec_id%250 centroids, nprobe=2 — mirrors
      * Cagra.build via knnGraphIvfWithDist, the factory arm's path).
      * `descentRounds`/`sampleDegree` interpose NN-descent refinement
      * rounds (mirrors GraphSearch.nnDescent) between the intermediate
      * graph and the prune; `alpha` is the Vamana RobustPrune slack on
      * the detour's second leg (mirrors Cagra.optimize's alpha). */
    def cagraGraphCtes(interDegree: Int, graphDegree: Int,
        ivfBucketed: Boolean = false, alpha: Double = 1.0,
        descentRounds: Int = 0, sampleDegree: Int = 8): String = {
      val dAB =
        "round(sqrt(list_sum(list_transform(range(1, len(a.embedding)+1), i -> " +
          "(CAST(a.embedding[i] AS DOUBLE) - CAST(b.embedding[i] AS DOUBLE)) * " +
          "(CAST(a.embedding[i] AS DOUBLE) - CAST(b.embedding[i] AS DOUBLE))))), 4)"
      val knngCtes =
        if (!ivfBucketed)
          s"""knng AS (
  SELECT src, dst, dist FROM (
    SELECT a.vec_id AS src, b.vec_id AS dst, $dAB AS dist,
      row_number() OVER (PARTITION BY a.vec_id ORDER BY $dAB ASC, b.vec_id ASC) AS rnk
    FROM embeddings a CROSS JOIN embeddings b WHERE a.vec_id <> b.vec_id
  ) WHERE rnk <= $interDegree
)"""
        else
          s"""gc AS (SELECT vec_id AS cid, embedding AS gcv FROM embeddings WHERE vec_id % 250 = 0),
gasn AS (
  SELECT vec_id, cid FROM (
    SELECT b.vec_id, gc.cid,
      row_number() OVER (PARTITION BY b.vec_id ORDER BY
        round(sqrt(list_sum(list_transform(range(1, len(b.embedding)+1), i ->
          (CAST(b.embedding[i] AS DOUBLE) - CAST(gc.gcv[i] AS DOUBLE)) *
          (CAST(b.embedding[i] AS DOUBLE) - CAST(gc.gcv[i] AS DOUBLE))))), 4) ASC, gc.cid ASC) AS rn
    FROM embeddings b CROSS JOIN gc
  ) WHERE rn = 1
),
gpr AS (
  SELECT qid, cid FROM (
    SELECT qq.vec_id AS qid, gc.cid,
      row_number() OVER (PARTITION BY qq.vec_id ORDER BY
        round(sqrt(list_sum(list_transform(range(1, len(qq.embedding)+1), i ->
          (CAST(qq.embedding[i] AS DOUBLE) - CAST(gc.gcv[i] AS DOUBLE)) *
          (CAST(qq.embedding[i] AS DOUBLE) - CAST(gc.gcv[i] AS DOUBLE))))), 4) ASC, gc.cid ASC) AS rn
    FROM embeddings qq CROSS JOIN gc
  ) WHERE rn <= 2
),
knng AS (
  SELECT src, dst, dist FROM (
    SELECT a.vec_id AS src, b.vec_id AS dst, $dAB AS dist,
      row_number() OVER (PARTITION BY a.vec_id ORDER BY $dAB ASC, b.vec_id ASC) AS rnk
    FROM embeddings a
    JOIN gpr p ON p.qid = a.vec_id
    JOIN gasn n ON n.cid = p.cid
    JOIN embeddings b ON b.vec_id = n.vec_id
    WHERE a.vec_id <> b.vec_id
  ) WHERE rnk <= $interDegree
)"""
      // NN-descent refinement rounds between the intermediate graph and
      // the prune (mirrors GraphSearch.nnDescent: sampled undirected
      // neighborhood → two-hop proposals → exact scoring → bounded top-k
      // merge; same grouped-min dedup and dist/dst tie-breaks)
      val descentCtes = (1 to descentRounds).map { r =>
        val prev = if (r == 1) "knng" else s"knng${r - 1}"
        s"""und$r AS (
  SELECT src, dst FROM (
    SELECT src, dst, dist, row_number() OVER (PARTITION BY src ORDER BY dist ASC, dst ASC) AS rn
    FROM (SELECT src, dst, min(dist) AS dist FROM (
      SELECT src, dst, dist FROM $prev UNION ALL SELECT dst AS src, src AS dst, dist FROM $prev
    ) GROUP BY 1, 2)
  ) WHERE rn <= $sampleDegree
),
cand$r AS (
  SELECT DISTINCT h1.src AS src, h2.dst AS dst
  FROM und$r h1 JOIN und$r h2 ON h2.src = h1.dst
  WHERE h1.src <> h2.dst
),
sc$r AS (
  SELECT c.src, c.dst, $dAB AS dist
  FROM cand$r c
  JOIN embeddings a ON a.vec_id = c.src
  JOIN embeddings b ON b.vec_id = c.dst
),
knng$r AS (
  SELECT src, dst, dist FROM (
    SELECT src, dst, dist, row_number() OVER (PARTITION BY src ORDER BY dist ASC, dst ASC) AS rn
    FROM (SELECT src, dst, min(dist) AS dist FROM (
      SELECT src, dst, dist FROM $prev UNION ALL SELECT src, dst, dist FROM sc$r
    ) GROUP BY 1, 2)
  ) WHERE rn <= $interDegree
)"""
      }
      val refined = if (descentRounds == 0) "knng" else s"knng$descentRounds"
      val allCtes = (knngCtes +: descentCtes).mkString(",\n")
      val secondLeg = if (alpha == 1.0) "md.dist" else s"md.dist * $alpha"
      s"""$allCtes,
det AS (
  SELECT DISTINCT sd.src AS src, sd.dst AS dst
  FROM $refined sd
  JOIN $refined sm ON sm.src = sd.src
  JOIN $refined md ON md.src = sm.dst AND md.dst = sd.dst
  WHERE sm.dist < sd.dist AND $secondLeg < sd.dist
),
kept AS (
  SELECT k.src, k.dst, k.dist FROM $refined k
  WHERE NOT EXISTS (SELECT 1 FROM det d WHERE d.src = k.src AND d.dst = k.dst)
),
merged AS (
  SELECT src, dst, min(dist) AS dist FROM (
    SELECT src, dst, dist FROM kept
    UNION ALL
    SELECT dst AS src, src AS dst, dist FROM kept
  ) GROUP BY 1, 2
),
g AS (
  SELECT src, dst, dist, rnk FROM (
    SELECT src, dst, dist,
      CAST(row_number() OVER (PARTITION BY src ORDER BY dist ASC, dst ASC) AS INT) AS rnk
    FROM merged
  ) WHERE rnk <= $graphDegree
)"""
    }

    /** Quantized-traversal graph beam + exact refine (mirrors
      * GraphSearch.beamSearchRefined): the beam scores against
      * RECONSTRUCTED vectors — SQ8 midpoint decode ("sq") or explicit-
      * codebook PQ codeword concatenation ("pq") — and only the final
      * frontier is reranked on raw data (faiss_hnsw.cc:739-860 refine). */
    def graphBeamQuant(
        ef: Int,
        k: Int,
        variant: String,
        iterPage: Option[(Int, Int, Int)] = None // (page, pageSize, refineRatio)
    ): String = {
      def topEf(src: String): String =
        s"""SELECT qid, nid, dist FROM (
  SELECT qid, nid, dist, row_number() OVER (PARTITION BY qid ORDER BY dist ASC, nid ASC) AS rn
  FROM $src
) WHERE rn <= $ef"""
      // approx tier: recon(vec_id, rv)
      val reconCtes = variant match {
        case "sq" => """stats AS (
  SELECT CAST(r.range AS INT) AS i,
         min(CAST(b.embedding[CAST(r.range AS INT)] AS DOUBLE)) AS mn,
         max(CAST(b.embedding[CAST(r.range AS INT)] AS DOUBLE)) AS mx
  FROM embeddings b CROSS JOIN range(1, 65) r GROUP BY 1
),
sv AS (SELECT list(mn ORDER BY i) AS mn, list(mx ORDER BY i) AS mx FROM stats),
recon AS (
  SELECT b.vec_id, list_transform(range(1, len(b.embedding)+1), i ->
      s.mn[i] + (LEAST(255.0, GREATEST(0.0,
        CASE WHEN s.mx[i] = s.mn[i] THEN 0.0
             ELSE floor((CAST(b.embedding[i] AS DOUBLE) - s.mn[i]) / (s.mx[i] - s.mn[i]) * 255.0) END
      )) + 0.5) * (s.mx[i] - s.mn[i]) / 255.0) AS rv
  FROM embeddings b CROSS JOIN sv s
)"""
        case "pq" =>
          val dExpr =
            "list_sum(list_transform(range(1, 9), j -> " +
              "(CAST(b.embedding[s.s*8 + j] AS DOUBLE) - CAST(cb.cv[s.s*8 + j] AS DOUBLE)) * " +
              "(CAST(b.embedding[s.s*8 + j] AS DOUBLE) - CAST(cb.cv[s.s*8 + j] AS DOUBLE))))"
          s"""cb AS (SELECT CAST(vec_id // 25 AS INT) AS c, embedding AS cv FROM embeddings
       WHERE vec_id % 25 = 0 AND vec_id < 400),
enc AS (
  SELECT b.vec_id AS vec_id, s.s AS s, cb.c AS code
  FROM embeddings b
  CROSS JOIN (SELECT unnest(range(0, 8)) AS s) s
  CROSS JOIN cb
  QUALIFY row_number() OVER (PARTITION BY b.vec_id, s.s
    ORDER BY $dExpr ASC, cb.c ASC) = 1
),
recon AS (
  SELECT e2.vec_id AS vec_id,
    flatten(list(cb.cv[e2.s*8+1 : e2.s*8+8] ORDER BY e2.s)) AS rv
  FROM enc e2 JOIN cb ON cb.c = e2.code
  GROUP BY e2.vec_id
)"""
        case "prq" =>
          // stage-1 = the "pq" codebook/codes; stage-2 codes the FLOAT
          // residual (vec − recon1) against an explicit residual codebook
          // (the same every-25th-row device applied to the residual frame);
          // final tier = recon1 + recon2. Float subtraction/addition is
          // correctly rounded identically on both engines.
          val dExpr1 =
            "list_sum(list_transform(range(1, 9), j -> " +
              "(CAST(b.embedding[s.s*8 + j] AS DOUBLE) - CAST(cb.cv[s.s*8 + j] AS DOUBLE)) * " +
              "(CAST(b.embedding[s.s*8 + j] AS DOUBLE) - CAST(cb.cv[s.s*8 + j] AS DOUBLE))))"
          val dExpr2 =
            "list_sum(list_transform(range(1, 9), j -> " +
              "(CAST(rr.rv[s.s*8 + j] AS DOUBLE) - CAST(cb2.cv[s.s*8 + j] AS DOUBLE)) * " +
              "(CAST(rr.rv[s.s*8 + j] AS DOUBLE) - CAST(cb2.cv[s.s*8 + j] AS DOUBLE))))"
          s"""cb AS (SELECT CAST(vec_id // 25 AS INT) AS c, embedding AS cv FROM embeddings
       WHERE vec_id % 25 = 0 AND vec_id < 400),
enc AS (
  SELECT b.vec_id AS vec_id, s.s AS s, cb.c AS code
  FROM embeddings b
  CROSS JOIN (SELECT unnest(range(0, 8)) AS s) s
  CROSS JOIN cb
  QUALIFY row_number() OVER (PARTITION BY b.vec_id, s.s
    ORDER BY $dExpr1 ASC, cb.c ASC) = 1
),
r1 AS (
  SELECT e2.vec_id AS vec_id,
    flatten(list(cb.cv[e2.s*8+1 : e2.s*8+8] ORDER BY e2.s)) AS rv
  FROM enc e2 JOIN cb ON cb.c = e2.code
  GROUP BY e2.vec_id
),
resid AS (
  SELECT b.vec_id AS vec_id,
    list_transform(range(1, len(b.embedding)+1), i ->
      CAST(CAST(b.embedding[i] AS REAL) - r.rv[i] AS REAL)) AS rv
  FROM embeddings b JOIN r1 r ON r.vec_id = b.vec_id
),
cb2 AS (SELECT CAST(vec_id // 25 AS INT) AS c, rv AS cv FROM resid
        WHERE vec_id % 25 = 0 AND vec_id < 400),
enc2 AS (
  SELECT rr.vec_id AS vec_id, s.s AS s, cb2.c AS code
  FROM resid rr
  CROSS JOIN (SELECT unnest(range(0, 8)) AS s) s
  CROSS JOIN cb2
  QUALIFY row_number() OVER (PARTITION BY rr.vec_id, s.s
    ORDER BY $dExpr2 ASC, cb2.c ASC) = 1
),
r2 AS (
  SELECT e3.vec_id AS vec_id,
    flatten(list(cb2.cv[e3.s*8+1 : e3.s*8+8] ORDER BY e3.s)) AS rv
  FROM enc2 e3 JOIN cb2 ON cb2.c = e3.code
  GROUP BY e3.vec_id
),
recon AS (
  SELECT a.vec_id AS vec_id,
    list_transform(range(1, len(a.rv)+1), i -> CAST(a.rv[i] + b2.rv[i] AS REAL)) AS rv
  FROM r1 a JOIN r2 b2 ON b2.vec_id = a.vec_id
)"""
        case other => sys.error(s"unknown graphBeamQuant variant $other")
      }
      val dq =
        "round(sqrt(list_sum(list_transform(range(1, len(q.qv)+1), i -> " +
          "(CAST(q.qv[i] AS DOUBLE) - CAST(r.rv[i] AS DOUBLE)) * " +
          "(CAST(q.qv[i] AS DOUBLE) - CAST(r.rv[i] AS DOUBLE))))), 4)"
      s"""WITH $qView,
$reconCtes,
g AS (
  SELECT src, dst FROM (
    SELECT a.vec_id AS src, b.vec_id AS dst,
      row_number() OVER (PARTITION BY a.vec_id ORDER BY
        round(sqrt(list_sum(list_transform(range(1, len(a.embedding)+1), i ->
          (CAST(a.embedding[i] AS DOUBLE) - CAST(b.embedding[i] AS DOUBLE)) *
          (CAST(a.embedding[i] AS DOUBLE) - CAST(b.embedding[i] AS DOUBLE))))), 4) ASC,
        b.vec_id ASC) AS rnk
    FROM embeddings a CROSS JOIN embeddings b WHERE a.vec_id <> b.vec_id
  ) WHERE rnk <= 5
),
e AS (SELECT vec_id AS nid FROM embeddings WHERE vec_id % 250 = 0),
s0 AS (
  SELECT q.qid AS qid, r.vec_id AS nid, $dq AS dist
  FROM q CROSS JOIN e JOIN recon r ON r.vec_id = e.nid
),
f0 AS (${topEf("s0")}),
c1 AS (SELECT DISTINCT f.qid AS qid, g.dst AS nid FROM f0 f JOIN g ON g.src = f.nid),
s1 AS (
  SELECT c.qid AS qid, r.vec_id AS nid, $dq AS dist
  FROM c1 c JOIN q ON q.qid = c.qid JOIN recon r ON r.vec_id = c.nid
),
u1 AS (SELECT DISTINCT qid, nid, dist FROM (SELECT * FROM f0 UNION ALL SELECT * FROM s1)),
f1 AS (${topEf("u1")}),
c2 AS (SELECT DISTINCT f.qid AS qid, g.dst AS nid FROM f1 f JOIN g ON g.src = f.nid),
s2 AS (
  SELECT c.qid AS qid, r.vec_id AS nid, $dq AS dist
  FROM c2 c JOIN q ON q.qid = c.qid JOIN recon r ON r.vec_id = c.nid
),
u2 AS (SELECT DISTINCT qid, nid, dist FROM (SELECT * FROM f1 UNION ALL SELECT * FROM s2)),
f2 AS (${topEf("u2")}),
${iterPage match {
        case None => s"""rer AS (
  SELECT f.qid AS qid, f.nid AS nid, $l2 AS dist
  FROM f2 f JOIN q ON q.qid = f.qid JOIN embeddings b ON b.vec_id = f.nid
)
SELECT qid, nid, dist, rnk FROM (
  SELECT qid, nid, dist,
         CAST(row_number() OVER (PARTITION BY qid ORDER BY dist ASC, nid ASC) AS INT) AS rnk
  FROM rer
) WHERE rnk <= $k"""
        case Some((p, ps, rr)) => s"""appr AS (
  SELECT qid, nid,
    row_number() OVER (PARTITION BY qid ORDER BY dist ASC, nid ASC) AS arnk
  FROM f2
),
rer AS (
  SELECT f.qid AS qid, f.nid AS nid, $l2 AS dist
  FROM appr f JOIN q ON q.qid = f.qid JOIN embeddings b ON b.vec_id = f.nid
  WHERE f.arnk <= ${p * ps * rr}
)
SELECT qid, nid, dist, rnk FROM (
  SELECT qid, nid, dist,
         CAST(row_number() OVER (PARTITION BY qid ORDER BY dist ASC, nid ASC) AS INT) AS rnk
  FROM rer
) WHERE rnk > ${(p - 1) * ps} AND rnk <= ${p * ps}"""
      }}"""
    }

    /** CTE list of the SQ8 train→code→reconstruct grid over `embeddings`,
      * ending in `recon` = (vec_id, embedding, rv) — shared by the
      * SQ8-rerank oracle and the quantization-error evaluation oracle
      * (EvalQueries). Mirrors Quantization.sq8Train/sq8Code/sq8Recon
      * exactly: per-dim [mn,mx], 255-bucket floor code, midpoint recon. */
    lazy val sq8ReconCtes: String = """stats AS (
  SELECT CAST(r.range AS INT) AS i,
         min(CAST(b.embedding[CAST(r.range AS INT)] AS DOUBLE)) AS mn,
         max(CAST(b.embedding[CAST(r.range AS INT)] AS DOUBLE)) AS mx
  FROM embeddings b CROSS JOIN range(1, 65) r GROUP BY 1
),
sv AS (SELECT list(mn ORDER BY i) AS mn, list(mx ORDER BY i) AS mx FROM stats),
recon AS (
  SELECT b.vec_id, b.embedding,
    list_transform(range(1, len(b.embedding)+1), i ->
      s.mn[i] + (LEAST(255.0, GREATEST(0.0,
        CASE WHEN s.mx[i] = s.mn[i] THEN 0.0
             ELSE floor((CAST(b.embedding[i] AS DOUBLE) - s.mn[i]) / (s.mx[i] - s.mn[i]) * 255.0) END
      )) + 0.5) * (s.mx[i] - s.mn[i]) / 255.0) AS rv
  FROM embeddings b CROSS JOIN sv s
)"""

    /** CTE list of the explicit-centroid IVF probe (nprobe=2), ending in
      * `ivfk` = the probed top-k — shared by [[ivfProbe]] and the recall
      * evaluation oracle (EvalQueries), which joins `ivfk` against the
      * exact arm. */
    lazy val ivfProbeCtes: String = s"""$qView,
c AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id % 250 = 0),
asn AS (
  SELECT vec_id, embedding, cid FROM (
    SELECT b.vec_id, b.embedding, c.cid,
      row_number() OVER (PARTITION BY b.vec_id ORDER BY
        round(sqrt(list_sum(list_transform(range(1, len(b.embedding)+1), i ->
          (CAST(b.embedding[i] AS DOUBLE) - CAST(c.cv[i] AS DOUBLE)) *
          (CAST(b.embedding[i] AS DOUBLE) - CAST(c.cv[i] AS DOUBLE))))), 4) ASC, c.cid ASC) AS rn
    FROM embeddings b CROSS JOIN c
  ) WHERE rn = 1
),
probes AS (
  SELECT qid, cid FROM (
    SELECT q.qid, c.cid,
      row_number() OVER (PARTITION BY q.qid ORDER BY
        round(sqrt(list_sum(list_transform(range(1, len(q.qv)+1), i ->
          (CAST(q.qv[i] AS DOUBLE) - CAST(c.cv[i] AS DOUBLE)) *
          (CAST(q.qv[i] AS DOUBLE) - CAST(c.cv[i] AS DOUBLE))))), 4) ASC, c.cid ASC) AS rn
    FROM q CROSS JOIN c
  ) WHERE rn <= 2
),
ivfpairs AS (
  SELECT q.qid AS qid, b.vec_id AS nid, $l2 AS dist
  FROM q JOIN probes p ON p.qid = q.qid JOIN asn b ON b.cid = p.cid
),
ivfk AS (
  SELECT qid, nid, dist, rnk FROM (
    SELECT qid, nid, dist,
           CAST(row_number() OVER (PARTITION BY qid ORDER BY dist ASC, nid ASC) AS INT) AS rnk
    FROM ivfpairs
  ) WHERE rnk <= $K
)"""

    /** Explicit-centroid IVF probe (nprobe=2) — shared by the in-memory
      * and the saved-then-loaded index queries (same semantics by V9's
      * Serialize/Deserialize contract, index_node.h:371-401). */
    lazy val ivfProbe: String = s"""WITH $ivfProbeCtes
SELECT qid, nid, dist, rnk FROM ivfk"""

    /** [[ivfProbe]] with every vector on a storage-cast grid — gates the
      * packed-list IVF rendering (IvfIndex.searchPacked): assignment,
      * probing and scoring all happen on the cast values, mirroring an
      * index whose lists were converted at Add time. */
    def ivfProbeCast(cast: String, k: Int = K): String = {
      def l2c(a: String, b: String): String =
        s"round(sqrt(list_sum(list_transform(range(1, len($a)+1), i -> " +
          s"($a[i] - $b[i]) * ($a[i] - $b[i])))), 4)"
      s"""WITH qf AS (
  SELECT vec_id AS qid, list_transform(embedding, $cast) AS qv
  FROM embeddings WHERE vec_id % $QMOD = 0
),
bfv AS (SELECT vec_id, list_transform(embedding, $cast) AS bv FROM embeddings),
c AS (SELECT vec_id AS cid, list_transform(embedding, $cast) AS cv FROM embeddings WHERE vec_id % 250 = 0),
asn AS (
  SELECT vec_id, bv, cid FROM (
    SELECT b.vec_id, b.bv, c.cid,
      row_number() OVER (PARTITION BY b.vec_id ORDER BY ${l2c("b.bv", "c.cv")} ASC, c.cid ASC) AS rn
    FROM bfv b CROSS JOIN c
  ) WHERE rn = 1
),
probes AS (
  SELECT qid, cid FROM (
    SELECT q.qid, c.cid,
      row_number() OVER (PARTITION BY q.qid ORDER BY ${l2c("q.qv", "c.cv")} ASC, c.cid ASC) AS rn
    FROM qf q CROSS JOIN c
  ) WHERE rn <= 2
),
pairs AS (
  SELECT q.qid AS qid, b.vec_id AS nid, ${l2c("q.qv", "b.bv")} AS dist
  FROM qf q JOIN probes p ON p.qid = q.qid JOIN asn b ON b.cid = p.cid
)
SELECT qid, nid, dist, rnk FROM (
  SELECT qid, nid, dist,
         CAST(row_number() OVER (PARTITION BY qid ORDER BY dist ASC, nid ASC) AS INT) AS rnk
  FROM pairs
) WHERE rnk <= $k"""
    }

    /** DiskANN beam (mirrors DiskAnn.search): traversal scored by PQ ADC
      * with the deterministic every-25th-vector codebook, fixed two-hop
      * unroll, then exact-L2 rerank of the L-sized search list.
      * `ivfGraph` swaps the exact all-pairs kNN graph for the IVF-bucketed
      * build (mirrors `GraphSearch.knnGraphIvf` with the explicit
      * every-250th-vector centroids) — the scalable build path under the
      * same hash gate. */
    def diskannBeam(ef: Int, k: Int, ivfGraph: Boolean = false): String = {
      def dExpr(vec: String, sRef: String): String =
        s"list_sum(list_transform(range(1, 9), j -> " +
          s"(CAST($vec[$sRef*8 + j] AS DOUBLE) - CAST(cb.cv[$sRef*8 + j] AS DOUBLE)) * " +
          s"(CAST($vec[$sRef*8 + j] AS DOUBLE) - CAST(cb.cv[$sRef*8 + j] AS DOUBLE))))"
      // ADC score of an explicit (qid, nid) candidate CTE: per-subspace
      // parts accumulated in subspace order (matches the Spark fold)
      def adc(candCte: String): String =
        s"""SELECT p.qid AS qid, p.nid AS nid,
    round(sqrt(list_sum(list(part ORDER BY s))), 4) AS dist
  FROM (
    SELECT c.qid AS qid, c.nid AS nid, e2.s AS s, ${dExpr("q.qv", "e2.s")} AS part
    FROM $candCte c JOIN q ON q.qid = c.qid
    JOIN enc e2 ON e2.vec_id = c.nid JOIN cb ON cb.c = e2.code
  ) p GROUP BY 1, 2"""
      def topEf(src: String): String =
        s"""SELECT qid, nid, dist FROM (
  SELECT qid, nid, dist, row_number() OVER (PARTITION BY qid ORDER BY dist ASC, nid ASC) AS rn
  FROM $src
) WHERE rn <= $ef"""
      s"""WITH $qView,
cb AS (SELECT CAST(vec_id // 25 AS INT) AS c, embedding AS cv FROM embeddings
       WHERE vec_id % 25 = 0 AND vec_id < 400),
enc AS (
  SELECT b.vec_id AS vec_id, s.s AS s, cb.c AS code
  FROM embeddings b
  CROSS JOIN (SELECT unnest(range(0, 8)) AS s) s
  CROSS JOIN cb
  QUALIFY row_number() OVER (PARTITION BY b.vec_id, s.s
    ORDER BY ${dExpr("b.embedding", "s.s")} ASC, cb.c ASC) = 1
),
${if (!ivfGraph) """g AS (
  SELECT src, dst FROM (
    SELECT a.vec_id AS src, b.vec_id AS dst,
      row_number() OVER (PARTITION BY a.vec_id ORDER BY
        round(sqrt(list_sum(list_transform(range(1, len(a.embedding)+1), i ->
          (CAST(a.embedding[i] AS DOUBLE) - CAST(b.embedding[i] AS DOUBLE)) *
          (CAST(a.embedding[i] AS DOUBLE) - CAST(b.embedding[i] AS DOUBLE))))), 4) ASC,
        b.vec_id ASC) AS rnk
    FROM embeddings a CROSS JOIN embeddings b WHERE a.vec_id <> b.vec_id
  ) WHERE rnk <= 5
),""" else """gc AS (SELECT vec_id AS cid, embedding AS gcv FROM embeddings WHERE vec_id % 250 = 0),
gasn AS (
  SELECT vec_id, cid FROM (
    SELECT b.vec_id, gc.cid,
      row_number() OVER (PARTITION BY b.vec_id ORDER BY
        round(sqrt(list_sum(list_transform(range(1, len(b.embedding)+1), i ->
          (CAST(b.embedding[i] AS DOUBLE) - CAST(gc.gcv[i] AS DOUBLE)) *
          (CAST(b.embedding[i] AS DOUBLE) - CAST(gc.gcv[i] AS DOUBLE))))), 4) ASC, gc.cid ASC) AS rn
    FROM embeddings b CROSS JOIN gc
  ) WHERE rn = 1
),
gpr AS (
  SELECT qid, cid FROM (
    SELECT qq.vec_id AS qid, gc.cid,
      row_number() OVER (PARTITION BY qq.vec_id ORDER BY
        round(sqrt(list_sum(list_transform(range(1, len(qq.embedding)+1), i ->
          (CAST(qq.embedding[i] AS DOUBLE) - CAST(gc.gcv[i] AS DOUBLE)) *
          (CAST(qq.embedding[i] AS DOUBLE) - CAST(gc.gcv[i] AS DOUBLE))))), 4) ASC, gc.cid ASC) AS rn
    FROM embeddings qq CROSS JOIN gc
  ) WHERE rn <= 2
),
g AS (
  SELECT src, dst FROM (
    SELECT a.vec_id AS src, b.vec_id AS dst,
      row_number() OVER (PARTITION BY a.vec_id ORDER BY
        round(sqrt(list_sum(list_transform(range(1, len(a.embedding)+1), i ->
          (CAST(a.embedding[i] AS DOUBLE) - CAST(b.embedding[i] AS DOUBLE)) *
          (CAST(a.embedding[i] AS DOUBLE) - CAST(b.embedding[i] AS DOUBLE))))), 4) ASC,
        b.vec_id ASC) AS rnk
    FROM embeddings a
    JOIN gpr p ON p.qid = a.vec_id
    JOIN gasn n ON n.cid = p.cid
    JOIN embeddings b ON b.vec_id = n.vec_id
    WHERE a.vec_id <> b.vec_id
  ) WHERE rnk <= 5
),"""}
c0 AS (SELECT q.qid AS qid, e.vec_id AS nid FROM q CROSS JOIN embeddings e WHERE e.vec_id % 250 = 0),
s0 AS (${adc("c0")}),
f0 AS (${topEf("s0")}),
c1 AS (SELECT DISTINCT f.qid AS qid, g.dst AS nid FROM f0 f JOIN g ON g.src = f.nid),
s1 AS (${adc("c1")}),
u1 AS (SELECT DISTINCT qid, nid, dist FROM (SELECT * FROM f0 UNION ALL SELECT * FROM s1)),
f1 AS (${topEf("u1")}),
c2 AS (SELECT DISTINCT f.qid AS qid, g.dst AS nid FROM f1 f JOIN g ON g.src = f.nid),
s2 AS (${adc("c2")}),
u2 AS (SELECT DISTINCT qid, nid, dist FROM (SELECT * FROM f1 UNION ALL SELECT * FROM s2)),
f2 AS (${topEf("u2")}),
vis AS (SELECT qid, nid FROM c0 UNION SELECT qid, nid FROM c1 UNION SELECT qid, nid FROM c2),
rer AS (
  SELECT v.qid AS qid, v.nid AS nid, $l2 AS dist
  FROM vis v JOIN q ON q.qid = v.qid JOIN embeddings b ON b.vec_id = v.nid
)
SELECT qid, nid, dist, rnk FROM (
  SELECT qid, nid, dist,
         CAST(row_number() OVER (PARTITION BY qid ORDER BY dist ASC, nid ASC) AS INT) AS rnk
  FROM rer
) WHERE rnk <= $k"""
    }

    /** Feder topology-overview SELECT over a graph CTE `gv(src, dst)` —
      * mirrors GraphSearch.federOverview: deterministic 4-adic layer,
      * out-degree, sorted adjacency as a canonical JSON array string. */
    def federOverview(gv: String, maxLevel: Int = 8): String = {
      val cases = (maxLevel to 1 by -1)
        .map(l => s"WHEN nid % ${math.pow(4, l).toLong} = 0 THEN $l")
        .mkString(" ")
      s"""SELECT nid, CAST(CASE $cases ELSE 0 END AS INT) AS level,
  CAST(degree AS INT) AS degree, adj_json
FROM (
  SELECT src AS nid, count(*) AS degree,
    '[' || array_to_string(list(dst ORDER BY dst), ',') || ']' AS adj_json
  FROM $gv GROUP BY src
)"""
    }

    /** Oracle for the gridded k-means IVF (GridKMeans): quantize to the
      * exact ×10⁴ integer grid, `iters` unrolled Lloyd rounds (integer
      * assignment, half-up integer means), then the probed search — all
      * 64-bit integer arithmetic, so it matches the Spark side exactly. */
    def gridKmeansKnn(stride: Int, iters: Int, nprobe: Int, k: Int = K): String = {
      val gdist = (g: String, c: String) =>
        s"list_sum(list_transform(range(1, len($g)+1), i -> ($g[i]-$c[i])*($g[i]-$c[i])))"
      def assign(out: String, cview: String): String =
        s"""$out AS (
  SELECT id, gv, cid FROM (
    SELECT g.id AS id, g.gv AS gv, c.cid AS cid,
      row_number() OVER (PARTITION BY g.id
        ORDER BY ${gdist("g.gv", "c.c")} ASC, c.cid ASC) AS rn
    FROM g CROSS JOIN $cview c
  ) WHERE rn = 1
)"""
      def update(aview: String, sview: String, cview: String): String =
        s"""$sview AS (
  SELECT cid, i, sum(gv[i]) AS s, count(*) AS n
  FROM (SELECT cid, gv, unnest(range(1, len(gv)+1)) AS i FROM $aview)
  GROUP BY cid, i
),
$cview AS (
  SELECT cid, list(CAST((CASE WHEN s < 0 THEN -1 ELSE 1 END)
    * ((2*abs(s)+n) // (2*n)) AS BIGINT) ORDER BY i) AS c
  FROM $sview GROUP BY cid
)"""
      val lloyd = (1 to iters)
        .map(it => s"${assign(s"a$it", s"c${it - 1}")},\n${update(s"a$it", s"s$it", s"c$it")}")
        .mkString(",\n")
      s"""WITH g AS (
  SELECT vec_id AS id,
    list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE)*10000) AS BIGINT)) AS gv
  FROM embeddings
),
qg AS (SELECT id AS qid, gv AS gq FROM g WHERE id % $QMOD = 0),
c0 AS (SELECT id AS cid, gv AS c FROM g WHERE id % $stride = 0),
$lloyd,
pr AS (
  SELECT qid, gq, cid FROM (
    SELECT q.qid AS qid, q.gq AS gq, c.cid AS cid,
      row_number() OVER (PARTITION BY q.qid
        ORDER BY ${gdist("q.gq", "c.c")} ASC, c.cid ASC) AS rn
    FROM qg q CROSS JOIN c$iters c
  ) WHERE rn <= $nprobe
),
${assign("ab", s"c$iters")},
res AS (
  SELECT pr.qid AS qid, a.id AS nid,
    CAST(${gdist("pr.gq", "a.gv")} AS BIGINT) AS dist
  FROM pr JOIN ab a ON a.cid = pr.cid
)
SELECT qid, nid, dist, rnk FROM (
  SELECT qid, nid, dist,
    CAST(row_number() OVER (PARTITION BY qid ORDER BY dist ASC, nid ASC) AS INT) AS rnk
  FROM res
) WHERE rnk <= $k"""
    }

    def knn(distExpr: String, desc: Boolean, k: Int = K, where: String = ""): String = {
      val ord = if (desc) "dist DESC, nid ASC" else "dist ASC, nid ASC"
      s"""WITH $qView,
pairs AS (
  SELECT q.qid AS qid, b.vec_id AS nid, $distExpr AS dist
  FROM q CROSS JOIN embeddings b $where
)
SELECT qid, nid, dist, rnk FROM (
  SELECT qid, nid, dist,
         CAST(row_number() OVER (PARTITION BY qid ORDER BY $ord) AS INT) AS rnk
  FROM pairs
) WHERE rnk <= $k"""
    }
  }

  // --------------------------------------------------------------- queries
  def all: Seq[GraftQuery] = Seq(
    // S1 — brute-force exact kNN (brute_force.cc:104-265): L2 / IP / COSINE
    GraftQuery(
      "bf_knn_l2",
      (s, dir) => BruteForce.knn(queryVecs(s, dir), baseVecs(s, dir), K, Metric.L2, roundDist = ROUND),
      Some(Sql.knn(Sql.l2, desc = false))),
    // multi-shard scatter-gather (the host's segment reduce above
    // per-segment indexes): shardAssign deals the base onto 8 balanced
    // shards, per-(query, shard) bounded heaps scatter, a per-query heap
    // gathers — the merged top-k provably equals the single-index answer,
    // so the plain knn oracle hash-gates the whole scatter/merge path
    GraftQuery(
      "serve_shard_merge",
      (s, dir) => {
        val base = baseVecs(s, dir)
        val assign = Packing
          .shardAssign(
            base.select(
              col("id").as("doc_id"),
              pmod(col("id") * 31, lit(97L)).as("n_chars")),
            shards = 8)
          .select(col("doc_id").as("id"), col("shard"))
        ShardedServe.scatterGather(
          queryVecs(s, dir), base.join(assign, "id"), K, Metric.L2, ROUND)
      },
      Some(Sql.knn(Sql.l2, desc = false))),
    // S1 as a FIRST-CLASS PLAN NODE: the custom KnnJoinNode logical
    // operator planned by KnnJoinStrategy (SparkSessionExtensions /
    // extraStrategies) into the fused KnnJoinExec — same answer as
    // bf_knn_l2, so the hash gate certifies the whole custom-operator
    // path (logical node → strategy → physical heap join)
    GraftQuery(
      "knn_join_exec",
      (s, dir) => KnnJoin.knnJoin(
        queryVecs(s, dir), baseVecs(s, dir).select(col("id"), col("vec")),
        K, Metric.L2, roundDist = ROUND),
      Some(Sql.knn(Sql.l2, desc = false))),
    // the OPTIMIZER-REWRITE path to the same exec: the user writes the
    // textbook cross-join + window top-k; graft.plans.KnnWindowRewrite
    // (Rule[LogicalPlan]) replaces the stack with KnnJoinNode — gated by
    // the same oracle, PlanSpec asserts the rewrite actually fires
    GraftQuery(
      "knn_window_rewrite",
      (s, dir) => {
        KnnJoin.register(s)
        import org.apache.spark.sql.expressions.Window
        import graft.functions.VectorFunctions.{l2 => l2f}
        queryVecs(s, dir)
          .crossJoin(baseVecs(s, dir).select(col("id"), col("vec")))
          .select(col("qid"), col("id").as("nid"),
            round(l2f(col("qvec"), col("vec")), 4).as("dist"))
          .withColumn("rnk", row_number().over(
            Window.partitionBy(col("qid")).orderBy(col("dist").asc, col("nid").asc)))
          .filter(col("rnk") <= K)
      },
      Some(Sql.knn(Sql.l2, desc = false))),
    GraftQuery(
      "bf_knn_ip",
      (s, dir) => BruteForce.knn(queryVecs(s, dir), baseVecs(s, dir), K, Metric.IP, roundDist = ROUND),
      Some(Sql.knn(Sql.ip, desc = true))),
    GraftQuery(
      "bf_knn_cosine",
      (s, dir) => BruteForce.knn(queryVecs(s, dir), baseVecs(s, dir), K, Metric.Cosine, roundDist = ROUND),
      Some(Sql.knn(Sql.cosine, desc = true))),
    // S1 in the reference's native convention — Knowhere/faiss L2 returns
    // SQUARED distance (no sqrt); pins the L2Sq metric surface
    GraftQuery(
      "bf_knn_l2sq",
      (s, dir) => BruteForce.knn(queryVecs(s, dir), baseVecs(s, dir), K, Metric.L2Sq, roundDist = ROUND),
      Some(Sql.knn(
        "round(list_sum(list_transform(range(1, len(q.qv)+1), i -> " +
          "(CAST(q.qv[i] AS DOUBLE) - CAST(b.embedding[i] AS DOUBLE)) * " +
          "(CAST(q.qv[i] AS DOUBLE) - CAST(b.embedding[i] AS DOUBLE)))), 4)",
        desc = false))),
    // S1 + BitsetView — filtered search: predicate over base rows pushed
    // into the scan (bitsetview.h:21-147 ⇒ WHERE label <> 1)
    GraftQuery(
      "bf_knn_l2_filtered",
      (s, dir) =>
        BruteForce.knn(queryVecs(s, dir), baseVecs(s, dir), K, Metric.L2,
          baseFilter = Some(col("label") =!= 1), roundDist = ROUND),
      Some(Sql.knn(Sql.l2, desc = false, where = "WHERE b.label <> 1"))),
    // S1 fixed-shape result contract — nq×k slots pre-filled with -1 ids
    // (brute_force.cc:676 std::fill; faiss -1 labels kept, :800; -1 skips
    // the id-offset rebase, :251): the base filter leaves FEWER than k
    // candidates, so every query's tail slots must surface as (-1, null)
    GraftQuery(
      "bf_knn_padded",
      (s, dir) =>
        BruteForce.knnPadded(queryVecs(s, dir), baseVecs(s, dir), K, Metric.L2,
          baseFilter = Some(col("id") % 1000 === 0 && col("id") <= 4000),
          roundDist = ROUND),
      Some(s"""WITH ${Sql.qView},
pairs AS (
  SELECT q.qid AS qid, b.vec_id AS nid, ${Sql.l2} AS dist
  FROM q CROSS JOIN embeddings b
  WHERE b.vec_id % 1000 = 0 AND b.vec_id <= 4000
),
res AS (
  SELECT qid, nid, dist, rnk FROM (
    SELECT qid, nid, dist,
           CAST(row_number() OVER (PARTITION BY qid ORDER BY dist ASC, nid ASC) AS INT) AS rnk
    FROM pairs
  ) WHERE rnk <= $K
),
slots AS (
  SELECT q.qid AS qid, CAST(t.r AS INT) AS rnk FROM q CROSS JOIN range(1, ${K + 1}) t(r)
)
SELECT s.qid, coalesce(res.nid, -1) AS nid, res.dist, s.rnk
FROM slots s LEFT JOIN res ON res.qid = s.qid AND res.rnk = s.rnk""")),
    // S20 — DocIdFilterByVector: sorted-docid exclusion as an anti-join on
    // the id list (sparse_utils.h:70-93)
    GraftQuery(
      "bf_knn_l2_exclude_ids",
      (s, dir) => {
        val excluded = Tables
          .embeddings(s, dir)
          .filter(col("vec_id") % 7 === 0)
          .select(col("vec_id").as("id"))
        val filteredBase =
          baseVecs(s, dir).join(broadcast(excluded), Seq("id"), "left_anti")
        BruteForce.knn(queryVecs(s, dir), filteredBase, K, Metric.L2, roundDist = ROUND)
      },
      Some(Sql.knn(Sql.l2, desc = false,
        where = "WHERE b.vec_id NOT IN (SELECT vec_id FROM embeddings WHERE vec_id % 7 = 0)"))),
    // S2 — range search, two-sided L2 bound (range_util.h:22-25)
    GraftQuery(
      "bf_range_l2",
      (s, dir) =>
        BruteForce
          .rangeSearch(queryVecs(s, dir), baseVecs(s, dir), Metric.L2, radius = 1.3,
            rangeFilter = 0.5, roundDist = ROUND)
          .select(col("qid"), col("nid"), col("dist")),
      Some(s"""WITH ${Sql.qView},
pairs AS (
  SELECT q.qid AS qid, b.vec_id AS nid, ${Sql.l2} AS dist
  FROM q CROSS JOIN embeddings b
)
SELECT qid, nid, dist FROM pairs WHERE dist >= 0.5 AND dist < 1.3""")),
    // V5 × S6 — EXACT range search with geometric list pruning (the
    // max_empty_result_buckets wasted-probe knob, index_param.h:101,
    // answered with the triangle inequality): lists whose centroid ball
    // cannot intersect the [0.5, 1.3) shell never reach the scan. The
    // prune is lossless, so the FULL-corpus range oracle gates it; the
    // IvfExtrasSpec asserts lists were actually dropped
    GraftQuery(
      "ivf_range_pruned",
      (s, dir) => {
        val cents = Tables
          .embeddings(s, dir)
          .filter(col("vec_id") % 250 === 0)
          .select(col("vec_id").as("cluster_id"), col("embedding").as("centroid"))
        val base = baseVecs(s, dir).select(col("id"), col("vec"))
        val index = IvfIndex.build(base, cents, ROUND)
        val radii = IvfIndex.listRadii(index, cents)
        IvfIndex.rangeSearchPruned(queryVecs(s, dir), index, cents, radii,
          radius = 1.3, rangeFilter = 0.5, roundDist = ROUND)
      },
      Some(s"""WITH ${Sql.qView},
pairs AS (
  SELECT q.qid AS qid, b.vec_id AS nid, ${Sql.l2} AS dist
  FROM q CROSS JOIN embeddings b
)
SELECT qid, nid, dist FROM pairs WHERE dist >= 0.5 AND dist < 1.3""")),
    // V5 — iterator-backed range search with early termination
    // (index_node.h:190-291 range_search_level overrun analog): pages the
    // lazy best-first stream and stops a query once a page contributes no
    // in-radius rows — same answer as bf_range_l2, fewer pages touched
    // (the AnnIteratorSpec asserts the page count)
    GraftQuery(
      "bf_range_early_stop",
      (s, dir) =>
        AnnIteratorOp
          .rangeSearchEarlyStop(queryVecs(s, dir), baseVecs(s, dir), Metric.L2,
            radius = 1.3, rangeFilter = 0.5, pageSize = 256, roundDist = ROUND)
          .select(col("qid"), col("nid"), col("dist")),
      Some(s"""WITH ${Sql.qView},
pairs AS (
  SELECT q.qid AS qid, b.vec_id AS nid, ${Sql.l2} AS dist
  FROM q CROSS JOIN embeddings b
)
SELECT qid, nid, dist FROM pairs WHERE dist >= 0.5 AND dist < 1.3""")),
    // V5 — range search under the range_search_k cap (config.h:599-601,
    // iterator-backed RangeSearch index_node.h:190-291): per query, only
    // the BEST capK in-range neighbors survive — the knob that bounds a
    // huge-radius result at scale
    GraftQuery(
      "bf_range_k_capped",
      (s, dir) =>
        BruteForce
          .rangeSearchCapped(queryVecs(s, dir), baseVecs(s, dir), Metric.L2, radius = 1.3,
            rangeFilter = 0.5, capK = 20, roundDist = ROUND),
      Some(s"""WITH ${Sql.qView},
pairs AS (
  SELECT q.qid AS qid, b.vec_id AS nid, ${Sql.l2} AS dist
  FROM q CROSS JOIN embeddings b
)
SELECT qid, nid, dist FROM pairs WHERE dist >= 0.5 AND dist < 1.3
QUALIFY row_number() OVER (PARTITION BY qid ORDER BY dist ASC, nid ASC) <= 20""")),
    // S19 — binary metrics over sign-bit-packed vectors (brute_force.cc:212-236):
    // Spark side packs 32 dims/BIGINT and uses bit_count(xor/and/or); the
    // oracle states the same quantity as per-dim sign comparisons.
    GraftQuery(
      "bin_knn_hamming",
      (s, dir) => {
        val q = queryVecs(s, dir).select(col("qid"), signBits(col("qvec")).as("qvec"))
        val b = baseVecs(s, dir).select(col("id"), signBits(col("vec")).as("vec"))
        BruteForce.knn(q, b, K, Metric.Hamming)
      },
      Some(Sql.knn(Sql.hamming, desc = false))),
    GraftQuery(
      "bin_knn_jaccard",
      (s, dir) => {
        val q = queryVecs(s, dir).select(col("qid"), signBits(col("qvec")).as("qvec"))
        val b = baseVecs(s, dir).select(col("id"), signBits(col("vec")).as("vec"))
        BruteForce.knn(q, b, K, Metric.Jaccard, roundDist = ROUND)
      },
      Some(Sql.knn(Sql.jaccard, desc = false))),
    // S19 — substructure containment count (binary_knn_mc analog): for each
    // query, how many base vectors' sign-sets contain the query's.
    GraftQuery(
      "bin_substructure",
      (s, dir) => {
        val q = queryVecs(s, dir).select(col("qid"), signBits(col("qvec")).as("qsig"))
        val b = baseVecs(s, dir).select(col("id"), signBits(col("vec")).as("bsig"))
        broadcast(q)
          .crossJoin(b)
          .filter(substructure(col("qsig"), col("bsig")))
          .groupBy(col("qid"))
          .agg(count(lit(1)).as("n_contained"))
      },
      Some(s"""WITH ${Sql.qView}
SELECT q.qid AS qid, count(*) AS n_contained
FROM q CROSS JOIN embeddings b
WHERE list_sum(list_transform(range(1, len(q.qv)+1), i ->
  CASE WHEN (q.qv[i] > 0) AND NOT (b.embedding[i] > 0) THEN 1 ELSE 0 END)) = 0
GROUP BY q.qid""")),
    // S19 — superstructure containment count (flip of substructure): for
    // each query, how many base sign-sets are contained BY the query's
    GraftQuery(
      "bin_superstructure",
      (s, dir) => {
        val q = queryVecs(s, dir).select(col("qid"), signBits(col("qvec")).as("qsig"))
        val b = baseVecs(s, dir).select(col("id"), signBits(col("vec")).as("bsig"))
        broadcast(q)
          .crossJoin(b)
          .filter(superstructure(col("qsig"), col("bsig")))
          .groupBy(col("qid"))
          .agg(count(lit(1)).as("n_contained"))
      },
      Some(s"""WITH ${Sql.qView}
SELECT q.qid AS qid, count(*) AS n_contained
FROM q CROSS JOIN embeddings b
WHERE list_sum(list_transform(range(1, len(q.qv)+1), i ->
  CASE WHEN (b.embedding[i] > 0) AND NOT (q.qv[i] > 0) THEN 1 ELSE 0 END)) = 0
GROUP BY q.qid""")),
    // S11/§1.2 — reduced-precision element types (operands.h:48-147):
    // fp16/bf16/int8 are STORAGE types computed through fp32 mocking
    // (operands.h:180-198); the storage-cast grid is reproduced in SQL so
    // the rounding itself is hash-gated
    GraftQuery(
      "bf_knn_l2_fp16",
      (s, dir) => {
        val q = queryVecs(s, dir).select(col("qid"), fp16Storage(col("qvec")).as("qvec"))
        val b = baseVecs(s, dir).select(col("id"), fp16Storage(col("vec")).as("vec"))
        BruteForce.knn(q, b, K, Metric.L2, roundDist = ROUND)
      },
      Some(Sql.castKnn(Sql.fp16Cast, desc = false, Sql.l2Cast))),
    GraftQuery(
      "bf_knn_ip_bf16",
      (s, dir) => {
        val q = queryVecs(s, dir).select(col("qid"), bf16Storage(col("qvec")).as("qvec"))
        val b = baseVecs(s, dir).select(col("id"), bf16Storage(col("vec")).as("vec"))
        BruteForce.knn(q, b, K, Metric.IP, roundDist = ROUND)
      },
      Some(Sql.castKnn(Sql.bf16Cast, desc = true, Sql.ipCast))),
    // TRUE half-width storage (operands.h:48-147): vectors packed to
    // dim*2-byte BINARY (graft.plans.Half, RNE narrowing), distances
    // decoded inline in codegen — bit-identical values to the grid-cast
    // queries above, so the SAME oracle gates the packed path; what
    // changes is the scan payload (halved — the 100-TB point of fp16)
    GraftQuery(
      "bf_knn_l2_fp16_packed",
      (s, dir) => {
        val q = queryVecs(s, dir).select(col("qid"), packFp16(col("qvec")).as("qvec"))
        val b = baseVecs(s, dir).select(col("id"), packFp16(col("vec")).as("vec"))
        BruteForce.knnPacked(q, b, K, Metric.L2, bf16 = false, roundDist = ROUND)
      },
      Some(Sql.castKnn(Sql.fp16Cast, desc = false, Sql.l2Cast))),
    GraftQuery(
      "bf_knn_ip_bf16_packed",
      (s, dir) => {
        val q = queryVecs(s, dir).select(col("qid"), packBf16(col("qvec")).as("qvec"))
        val b = baseVecs(s, dir).select(col("id"), packBf16(col("vec")).as("vec"))
        BruteForce.knnPacked(q, b, K, Metric.IP, bf16 = true, roundDist = ROUND)
      },
      Some(Sql.castKnn(Sql.bf16Cast, desc = true, Sql.ipCast))),
    GraftQuery(
      "bf_knn_l2_int8",
      (s, dir) => {
        val q = queryVecs(s, dir).select(col("qid"), int8Storage(col("qvec"), 100.0).as("qvec"))
        val b = baseVecs(s, dir).select(col("id"), int8Storage(col("vec"), 100.0).as("vec"))
        BruteForce.knn(q, b, K, Metric.L2, roundDist = ROUND)
      },
      Some(Sql.castKnn(Sql.int8Cast, desc = false, Sql.l2Cast))),
    // int8 at its TRUE width: 1 byte/element BINARY (quarter the fp32
    // bytes), dequantize-inline kernels, same grid oracle as above
    GraftQuery(
      "bf_knn_l2_int8_packed",
      (s, dir) => {
        val q = queryVecs(s, dir).select(col("qid"), packInt8(col("qvec"), 100.0).as("qvec"))
        val b = baseVecs(s, dir).select(col("id"), packInt8(col("vec"), 100.0).as("vec"))
        BruteForce.knnPackedInt8(q, b, K, Metric.L2, scale = 100.0, roundDist = ROUND)
      },
      Some(Sql.castKnn(Sql.int8Cast, desc = false, Sql.l2Cast))),
    // S12 — norm precompute (brute_force.cc:66-101)
    GraftQuery(
      "vec_norms",
      (s, dir) =>
        Tables
          .embeddings(s, dir)
          .select(col("vec_id"), round(normL2(col("embedding")), 4).as("norm")),
      Some(s"SELECT vec_id, round(${Sql.norm("embedding")}, 4) AS norm FROM embeddings")),
    // V7 — GetVectorByIds (flat.cc:222-256), summarized hash-safely
    GraftQuery(
      "get_vector_by_ids",
      (s, dir) => {
        val ids = Tables.embeddings(s, dir).filter(col("vec_id") % 97 === 0).select(col("vec_id").as("id"))
        BruteForce
          .getVectorByIds(ids, baseVecs(s, dir))
          .select(
            col("id").as("vec_id"),
            size(col("vec")).as("dim"),
            round(aggregate(col("vec"), lit(0.0d), (a, x) => a + x.cast("double")), 4).as("checksum"))
      },
      Some("""SELECT vec_id, CAST(len(embedding) AS INT) AS dim,
round(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE))), 4) AS checksum
FROM embeddings WHERE vec_id % 97 = 0""")),
    // BOTH budget axes at once — matryoshka dimension slice (first 32 of
    // 64) × fp16 storage grid: the composed storage tier a 100 TB corpus
    // actually deploys (4× fewer bytes than raw fp32). Each stage is the
    // already-gated op; the composition is gated end to end
    GraftQuery(
      "bf_knn_l2_mrl32_fp16",
      (s, dir) => {
        import graft.functions.VectorFunctions.fp16Storage
        val q = queryVecs(s, dir)
          .select(col("qid"), fp16Storage(slice(col("qvec"), 1, 32)).as("qvec"))
        val b = baseVecs(s, dir)
          .select(col("id"), fp16Storage(slice(col("vec"), 1, 32)).as("vec"))
        BruteForce.knn(q, b, K, Metric.L2, roundDist = ROUND)
      },
      Some(s"""WITH qf AS (
  SELECT vec_id AS qid, list_transform(embedding[1:32], ${Sql.fp16Cast}) AS qv
  FROM embeddings WHERE vec_id % $QMOD = 0
),
bf AS (SELECT vec_id, list_transform(embedding[1:32], ${Sql.fp16Cast}) AS bv FROM embeddings),
pairs AS (
  SELECT q.qid AS qid, b.vec_id AS nid, ${Sql.l2Cast} AS dist
  FROM qf q CROSS JOIN bf b
)
SELECT qid, nid, dist, rnk FROM (
  SELECT qid, nid, dist,
         CAST(row_number() OVER (PARTITION BY qid ORDER BY dist ASC, nid ASC) AS INT) AS rnk
  FROM pairs
) WHERE rnk <= $K""")),
    // normalize-then-IP (the reference's NormalizeVecs preprocessing,
    // norm.h — COSINE executed as IP over unit vectors): both sides
    // L2-normalized map-side in double then stored back on the float
    // grid; the IP ranking over them is gated element-for-element, and
    // RecallSpec asserts the id set equals the cosine arm's
    GraftQuery(
      "bf_knn_ip_normalized",
      (s, dir) => {
        import graft.functions.VectorFunctions.{normL2, normalizeL2Pre}
        val q = queryVecs(s, dir)
          .select(col("qid"), col("qvec"), normL2(col("qvec")).as("_n"))
          .select(col("qid"), normalizeL2Pre(col("qvec"), col("_n")).as("qvec"))
        val b = baseVecs(s, dir)
          .select(col("id"), col("vec"), normL2(col("vec")).as("_n"))
          .select(col("id"), normalizeL2Pre(col("vec"), col("_n")).as("vec"))
        BruteForce.knn(q, b, K, Metric.IP, roundDist = ROUND)
      },
      Some(s"""WITH qn AS (
  SELECT vec_id AS qid, list_transform(embedding, x -> CAST(CAST(x AS DOUBLE) /
    sqrt(list_sum(list_transform(embedding, y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE)))) AS FLOAT)) AS qv
  FROM embeddings WHERE vec_id % $QMOD = 0
),
bn AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(CAST(x AS DOUBLE) /
    sqrt(list_sum(list_transform(embedding, y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE)))) AS FLOAT)) AS bv
  FROM embeddings
),
pairs AS (
  SELECT q.qid AS qid, b.vec_id AS nid,
    round(list_sum(list_transform(range(1, len(q.qv)+1), i ->
      CAST(q.qv[i] AS DOUBLE) * CAST(b.bv[i] AS DOUBLE))), 4) AS dist
  FROM qn q CROSS JOIN bn b
)
SELECT qid, nid, dist, rnk FROM (
  SELECT qid, nid, dist,
         CAST(row_number() OVER (PARTITION BY qid ORDER BY dist DESC, nid ASC) AS INT) AS rnk
  FROM pairs
) WHERE rnk <= $K""")),
    // V7 × the packed storage tier: retrieval decodes the 2-byte lists
    // through the same RNE grid the kernels compute on — the checksum
    // certifies pack→unpack round-trips bit-exactly against the oracle's
    // value-grid rendering, at half the bytes at rest
    GraftQuery(
      "get_vector_by_ids_packed",
      (s, dir) => {
        import graft.functions.VectorFunctions.{packFp16, unpackFp16}
        val ids = Tables.embeddings(s, dir).filter(col("vec_id") % 97 === 0).select(col("vec_id").as("id"))
        val packed = baseVecs(s, dir).select(col("id"), packFp16(col("vec")).as("vp"))
        BruteForce
          .getVectorByIds(ids, packed)
          .select(col("id").as("vec_id"), unpackFp16(col("vp")).as("vec"))
          .select(
            col("vec_id"),
            size(col("vec")).as("dim"),
            round(aggregate(col("vec"), lit(0.0d), (a, x) => a + x.cast("double")), 4).as("checksum"))
      },
      Some(s"""SELECT vec_id, CAST(len(embedding) AS INT) AS dim,
round(list_sum(list_transform(list_transform(embedding, ${Sql.fp16Cast}), x -> CAST(x AS DOUBLE))), 4) AS checksum
FROM embeddings WHERE vec_id % 97 = 0""")),
    // S6/S15 — SQ8 quantization + SCANN-style reorder_k rerank
    // (ivf.cc:774-788, index_node.h:538-567)
    GraftQuery(
      "sq8_knn_rerank",
      (s, dir) =>
        Quantization.sq8Knn(
          queryVecs(s, dir),
          baseVecs(s, dir).select(col("id"), col("vec")),
          K,
          reorderK = 50,
          roundDist = ROUND),
      Some(s"""WITH ${Sql.qView},
${Sql.sq8ReconCtes},
cand AS (
  SELECT qid, nid, row_number() OVER (PARTITION BY qid ORDER BY dist, nid) AS crnk FROM (
    SELECT q.qid AS qid, r.vec_id AS nid,
      round(sqrt(list_sum(list_transform(range(1, len(q.qv)+1), i ->
        (CAST(q.qv[i] AS DOUBLE) - r.rv[i]) * (CAST(q.qv[i] AS DOUBLE) - r.rv[i])))), 4) AS dist
    FROM q CROSS JOIN recon r)
),
rer AS (
  SELECT c.qid AS qid, c.nid AS nid, ${Sql.l2} AS dist
  FROM cand c JOIN q ON q.qid = c.qid JOIN embeddings b ON b.vec_id = c.nid
  WHERE c.crnk <= 50
)
SELECT qid, nid, dist, rnk FROM (
  SELECT qid, nid, dist, CAST(row_number() OVER (PARTITION BY qid ORDER BY dist ASC, nid ASC) AS INT) AS rnk
  FROM rer
) WHERE rnk <= $K""")),
    // V15 — Cluster::Assign over an explicit centroid table (relational
    // argmin; Train via MLlib KMeans is covered in ScalaTest)
    GraftQuery(
      "cluster_assign",
      (s, dir) => {
        val cents = Tables
          .embeddings(s, dir)
          .filter(col("vec_id") % 250 === 0)
          .select(col("vec_id").as("cluster_id"), col("embedding").as("centroid"))
        Cluster
          .assignToCentroids(
            baseVecs(s, dir).select(col("id"), col("vec")),
            cents,
            roundDist = ROUND)
      },
      Some("""WITH c AS (SELECT vec_id AS cluster_id, embedding AS centroid FROM embeddings WHERE vec_id % 250 = 0),
pairs AS (
  SELECT b.vec_id AS id, c.cluster_id AS cluster_id,
    round(sqrt(list_sum(list_transform(range(1, len(b.embedding)+1), i ->
      (CAST(b.embedding[i] AS DOUBLE) - CAST(c.centroid[i] AS DOUBLE)) *
      (CAST(b.embedding[i] AS DOUBLE) - CAST(c.centroid[i] AS DOUBLE))))), 4) AS dist
  FROM embeddings b CROSS JOIN c
)
SELECT id, cluster_id, dist FROM (
  SELECT id, cluster_id, dist, row_number() OVER (PARTITION BY id ORDER BY dist ASC, cluster_id ASC) AS rn
  FROM pairs
) WHERE rn = 1""")),
    // S6 — IVF search mechanics with an explicit codebook: assign (Add),
    // probe nprobe=2 nearest centroids, scan only probed lists, exact
    // distance, top-k (ivf.cc:691-810). KMeans-trained centroids are
    // exercised in ScalaTest (recall-gated, not hash-gated).
    GraftQuery(
      "ivf_knn_probe",
      (s, dir) => {
        val cents = Tables
          .embeddings(s, dir)
          .filter(col("vec_id") % 250 === 0)
          .select(col("vec_id").as("cluster_id"), col("embedding").as("centroid"))
        val base = baseVecs(s, dir).select(col("id"), col("vec"))
        val index = IvfIndex.build(base, cents, ROUND)
        IvfIndex.search(queryVecs(s, dir), index, cents, K, nprobe = 2, Metric.L2, ROUND)
      },
      Some(Sql.ivfProbe)),
    // S6 × S1 — IVF over TRUE packed fp16 lists (IvfIndex.searchPacked):
    // assignment/probe/score all on the fp16 grid, lists stored as
    // 2-byte BINARY — the probed scan (the nprobe-scaling cost at 100 TB)
    // moves half the bytes; decode-inline kernel, same grid oracle shape
    GraftQuery(
      "ivf_knn_probe_fp16_packed",
      (s, dir) => {
        val centsG = Tables
          .embeddings(s, dir)
          .filter(col("vec_id") % 250 === 0)
          .select(col("vec_id").as("cluster_id"), fp16Storage(col("embedding")).as("centroid"))
        val baseG = baseVecs(s, dir).select(col("id"), fp16Storage(col("vec")).as("vec"))
        val index = IvfIndex.build(baseG, centsG, ROUND)
        val packed = index.select(col("id"), packFp16(col("vec")).as("vec"), col("cluster_id"))
        IvfIndex.searchPacked(
          queryVecs(s, dir).select(col("qid"), fp16Storage(col("qvec")).as("qvec")),
          packed, centsG, K, nprobe = 2, Metric.L2, bf16 = false, ROUND)
      },
      Some(Sql.ivfProbeCast(Sql.fp16Cast))),
    // V9 × V12 — Serialize/Deserialize under the hash gate: the index is
    // SAVED to parquet (partitioned lists), LOADED via the factory, and
    // searched — same oracle as ivf_knn_probe, so the round-trip itself
    // is what the hash certifies. The loaded path also exercises DPP
    // partition pruning on the lists scan (FacadeSpec asserts the plan).
    GraftQuery(
      "ivf_knn_probe_loaded",
      (s, dir) => {
        val cents = Tables
          .embeddings(s, dir)
          .filter(col("vec_id") % 250 === 0)
          .select(col("vec_id").as("cluster_id"), col("embedding").as("centroid"))
        val base = baseVecs(s, dir).select(col("id"), col("vec"))
        val idx = new graft.IvfFlatIndex(
          IvfIndex.build(base, cents, ROUND), cents, Metric.L2, nprobe = 2, ROUND)
        val tmp = StreamStage.dir("graft-ivf-loaded").toString
        idx.save(tmp)
        graft.IndexFactory.loadIvf(s, tmp, Metric.L2, nprobe = 2, ROUND)
          .search(queryVecs(s, dir), K, None)
      },
      Some(Sql.ivfProbe)),
    // V3 × V12 — segment MERGE (compaction): two same-codebook halves
    // merged list-wise (no retrain — the CC fixed-lists contract,
    // ivf.cc:1250-1262); searching the merged index answers exactly as
    // the single build, so the same oracle gates it
    GraftQuery(
      "ivf_knn_probe_merged",
      (s, dir) => {
        val cents = Tables
          .embeddings(s, dir)
          .filter(col("vec_id") % 250 === 0)
          .select(col("vec_id").as("cluster_id"), col("embedding").as("centroid"))
        val base = baseVecs(s, dir).select(col("id"), col("vec"))
        val median = base.selectExpr("percentile(id, 0.5)").head().getDouble(0).toLong
        def half(pred: org.apache.spark.sql.Column) = new graft.IvfFlatIndex(
          IvfIndex.build(base.filter(pred), cents, ROUND), cents, Metric.L2,
          nprobe = 2, ROUND)
        half(col("id") <= median)
          .merge(half(col("id") > median))
          .search(queryVecs(s, dir), K, None)
      },
      Some(Sql.ivfProbe)),
    // S6 BIN_IVF_FLAT — the IVF family over bit-packed binary vectors
    // with HAMMING assignment/probing (`ivf.cc:1244-1276` registers
    // BIN_IVF_FLAT): same probe-and-prune mechanics, binary metric
    GraftQuery(
      "bin_ivf_knn_hamming",
      (s, dir) => {
        val q = queryVecs(s, dir).select(col("qid"), signBits(col("qvec")).as("qvec"))
        val b = baseVecs(s, dir).select(col("id"), signBits(col("vec")).as("vec"))
        val cents = Tables
          .embeddings(s, dir)
          .filter(col("vec_id") % 250 === 0)
          .select(col("vec_id").as("cluster_id"), signBits(col("embedding")).as("centroid"))
        val index = IvfIndex.build(b, cents, None, Metric.Hamming)
        IvfIndex.search(q, index, cents, K, nprobe = 1, Metric.Hamming)
      },
      Some {
        def ham(x: String, y: String): String =
          s"CAST(list_sum(list_transform(range(1, len($x)+1), i -> " +
            s"CASE WHEN ($x[i] > 0) <> ($y[i] > 0) THEN 1 ELSE 0 END)) AS DOUBLE)"
        s"""WITH ${Sql.qView},
c AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id % 250 = 0),
asn AS (
  SELECT vec_id, embedding, cid FROM (
    SELECT b.vec_id, b.embedding, c.cid,
      row_number() OVER (PARTITION BY b.vec_id ORDER BY ${ham("b.embedding", "c.cv")} ASC, c.cid ASC) AS rn
    FROM embeddings b CROSS JOIN c
  ) WHERE rn = 1
),
probes AS (
  SELECT qid, cid FROM (
    SELECT q.qid, c.cid,
      row_number() OVER (PARTITION BY q.qid ORDER BY ${ham("q.qv", "c.cv")} ASC, c.cid ASC) AS rn
    FROM q CROSS JOIN c
  ) WHERE rn <= 1
),
pairs AS (
  SELECT q.qid AS qid, b.vec_id AS nid, ${ham("q.qv", "b.embedding")} AS dist
  FROM q JOIN probes p ON p.qid = q.qid JOIN asn b ON b.cid = p.cid
)
SELECT qid, nid, dist, rnk FROM (
  SELECT qid, nid, dist,
         CAST(row_number() OVER (PARTITION BY qid ORDER BY dist ASC, nid ASC) AS INT) AS rnk
  FROM pairs
) WHERE rnk <= $K"""
      }),
    // V5 × S6 × S19 — BIN_IVF range search: probed lists, HAMMING metric,
    // two-sided bound (ivf.cc:812-917 registers RangeSearch for the
    // binary IVF kinds too) — self-distance excluded by the near bound
    GraftQuery(
      "bin_ivf_range_hamming",
      (s, dir) => {
        val q = queryVecs(s, dir).select(col("qid"), signBits(col("qvec")).as("qvec"))
        val b = baseVecs(s, dir).select(col("id"), signBits(col("vec")).as("vec"))
        val cents = Tables
          .embeddings(s, dir)
          .filter(col("vec_id") % 250 === 0)
          .select(col("vec_id").as("cluster_id"), signBits(col("embedding")).as("centroid"))
        val index = IvfIndex.build(b, cents, None, Metric.Hamming)
        IvfIndex.rangeSearch(q, index, cents, nprobe = 1, Metric.Hamming,
          radius = 26.0, rangeFilter = 1.0)
      },
      Some {
        def ham(x: String, y: String): String =
          s"CAST(list_sum(list_transform(range(1, len($x)+1), i -> " +
            s"CASE WHEN ($x[i] > 0) <> ($y[i] > 0) THEN 1 ELSE 0 END)) AS DOUBLE)"
        s"""WITH ${Sql.qView},
c AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id % 250 = 0),
asn AS (
  SELECT vec_id, embedding, cid FROM (
    SELECT b.vec_id, b.embedding, c.cid,
      row_number() OVER (PARTITION BY b.vec_id ORDER BY ${ham("b.embedding", "c.cv")} ASC, c.cid ASC) AS rn
    FROM embeddings b CROSS JOIN c
  ) WHERE rn = 1
),
probes AS (
  SELECT qid, cid FROM (
    SELECT q.qid, c.cid,
      row_number() OVER (PARTITION BY q.qid ORDER BY ${ham("q.qv", "c.cv")} ASC, c.cid ASC) AS rn
    FROM q CROSS JOIN c
  ) WHERE rn <= 1
),
pairs AS (
  SELECT q.qid AS qid, b.vec_id AS nid, ${ham("q.qv", "b.embedding")} AS dist
  FROM q JOIN probes p ON p.qid = q.qid JOIN asn b ON b.cid = p.cid
)
SELECT qid, nid, dist FROM pairs WHERE dist >= 1.0 AND dist < 26.0"""
      }),
    // S17 — adaptive filtered search, oracle-gated: the selectivity-driven
    // strategy picks the IVF branch and filter-scales nprobe to nlist
    // (ivf.cc:750-760), recovering the exact filtered answer — the hash
    // match gates the whole adaptive composition
    GraftQuery(
      "adaptive_filtered_knn",
      (s, dir) => {
        val base = baseVecs(s, dir).select(col("id"), col("vec"))
        val cents = Tables
          .embeddings(s, dir)
          .filter(col("vec_id") % 250 === 0)
          .select(col("vec_id").as("cluster_id"), col("embedding").as("centroid"))
        val index = IvfIndex.build(base, cents, ROUND)
        AdaptiveSearch.knn(queryVecs(s, dir), base, index, cents, K, nprobe = 1,
          filter = Some(col("id") % 10 === 0), Metric.L2, ROUND).df
      },
      Some(Sql.knn(Sql.l2, desc = false, where = "WHERE b.vec_id % 10 = 0"))),
    // S18/V10 — Feder json_id_set analog: per-list sorted member ids
    GraftQuery(
      "ivf_feder_lists",
      (s, dir) => {
        val cents = Tables
          .embeddings(s, dir)
          .filter(col("vec_id") % 250 === 0)
          .select(col("vec_id").as("cluster_id"), col("embedding").as("centroid"))
        Cluster
          .assignToCentroids(baseVecs(s, dir).select(col("id"), col("vec")), cents, ROUND)
          .groupBy(col("cluster_id"))
          .agg(
            count(lit(1)).as("n_vectors"),
            // comma-joined rather than ARRAY: the driver's comparator sorts
            // result columns with pandas, which cannot order list cells
            array_join(
              transform(sort_array(collect_list(col("id"))), _.cast("string")),
              ",").as("member_ids"))
      },
      Some("""WITH c AS (SELECT vec_id AS cluster_id, embedding AS centroid FROM embeddings WHERE vec_id % 250 = 0),
asn AS (
  SELECT id, cluster_id FROM (
    SELECT b.vec_id AS id, c.cluster_id,
      row_number() OVER (PARTITION BY b.vec_id ORDER BY
        round(sqrt(list_sum(list_transform(range(1, len(b.embedding)+1), i ->
          (CAST(b.embedding[i] AS DOUBLE) - CAST(c.centroid[i] AS DOUBLE)) *
          (CAST(b.embedding[i] AS DOUBLE) - CAST(c.centroid[i] AS DOUBLE))))), 4) ASC, c.cluster_id ASC) AS rn
    FROM embeddings b CROSS JOIN c
  ) WHERE rn = 1
)
SELECT cluster_id, count(*) AS n_vectors,
       array_to_string(list(id ORDER BY id), ',') AS member_ids
FROM asn GROUP BY 1""")),
    // S2 with a similarity metric — bound direction inverts:
    // radius < sim <= rangeFilter (range_util.h:22-25)
    GraftQuery(
      "bf_range_cosine",
      (s, dir) =>
        BruteForce
          .rangeSearch(queryVecs(s, dir), baseVecs(s, dir), Metric.Cosine, radius = 0.3,
            rangeFilter = 1.01, roundDist = ROUND)
          .select(col("qid"), col("nid"), col("dist")),
      Some(s"""WITH ${Sql.qView},
pairs AS (
  SELECT q.qid AS qid, b.vec_id AS nid, ${Sql.cosine} AS dist
  FROM q CROSS JOIN embeddings b
)
SELECT qid, nid, dist FROM pairs WHERE dist > 0.3 AND dist <= 1.01""")),
    // S2 × S19 — range search over a binary metric (hamming < radius)
    GraftQuery(
      "bin_range_hamming",
      (s, dir) => {
        val q = queryVecs(s, dir).select(col("qid"), signBits(col("qvec")).as("qvec"))
        val b = baseVecs(s, dir).select(col("id"), signBits(col("vec")).as("vec"))
        BruteForce
          .rangeSearch(q, b, Metric.Hamming, radius = 22.0, rangeFilter = 0.0)
          .select(col("qid"), col("nid"), col("dist"))
      },
      Some(s"""WITH ${Sql.qView},
pairs AS (
  SELECT q.qid AS qid, b.vec_id AS nid, ${Sql.hamming} AS dist
  FROM q CROSS JOIN embeddings b
)
SELECT qid, nid, dist FROM pairs WHERE dist >= 0.0 AND dist < 22.0""")),
    // S2 × S19 — range search under the Jaccard DISTANCE (1 − |∩|/|∪|
    // over sign bits): the other binary metric's range arm
    GraftQuery(
      "bin_range_jaccard",
      (s, dir) => {
        val q = queryVecs(s, dir).select(col("qid"), signBits(col("qvec")).as("qvec"))
        val b = baseVecs(s, dir).select(col("id"), signBits(col("vec")).as("vec"))
        BruteForce
          .rangeSearch(q, b, Metric.Jaccard, radius = 0.35, rangeFilter = 0.0,
            roundDist = ROUND)
          .select(col("qid"), col("nid"), col("dist"))
      },
      Some(s"""WITH ${Sql.qView},
pairs AS (
  SELECT q.qid AS qid, b.vec_id AS nid, ${Sql.jaccard} AS dist
  FROM q CROSS JOIN embeddings b
)
SELECT qid, nid, dist FROM pairs WHERE dist >= 0.0 AND dist < 0.35""")),
    // S13 — range-result CSR assembly: `lims` = per-query result counts
    // (range_util.h:27-40; lims article of the result DataSet)
    GraftQuery(
      "bf_range_lims",
      (s, dir) =>
        BruteForce
          .rangeSearch(queryVecs(s, dir), baseVecs(s, dir), Metric.L2, radius = 1.3,
            rangeFilter = 0.5, roundDist = ROUND)
          .groupBy(col("qid"))
          .agg(count(lit(1)).as("lim")),
      Some(s"""WITH ${Sql.qView},
pairs AS (
  SELECT q.qid AS qid, b.vec_id AS nid, ${Sql.l2} AS dist
  FROM q CROSS JOIN embeddings b
)
SELECT qid, count(*) AS lim FROM pairs WHERE dist >= 0.5 AND dist < 1.3 GROUP BY qid""")),
    // S18/V10 — index introspection (Feder-style describe): per-list
    // population and mean distance-to-centroid of the IVF structure
    GraftQuery(
      "ivf_describe",
      (s, dir) => {
        val cents = Tables
          .embeddings(s, dir)
          .filter(col("vec_id") % 250 === 0)
          .select(col("vec_id").as("cluster_id"), col("embedding").as("centroid"))
        Cluster
          .assignToCentroids(baseVecs(s, dir).select(col("id"), col("vec")), cents, ROUND)
          .groupBy(col("cluster_id"))
          .agg(
            count(lit(1)).as("n_vectors"),
            round(sum(round(col("dist"), 4).cast("decimal(28,4)")).cast("double") / count(lit(1)), 4)
              .as("mean_dist"))
      },
      Some("""WITH c AS (SELECT vec_id AS cluster_id, embedding AS centroid FROM embeddings WHERE vec_id % 250 = 0),
pairs AS (
  SELECT b.vec_id AS id, c.cluster_id AS cluster_id,
    round(sqrt(list_sum(list_transform(range(1, len(b.embedding)+1), i ->
      (CAST(b.embedding[i] AS DOUBLE) - CAST(c.centroid[i] AS DOUBLE)) *
      (CAST(b.embedding[i] AS DOUBLE) - CAST(c.centroid[i] AS DOUBLE))))), 4) AS dist
  FROM embeddings b CROSS JOIN c
),
asn AS (
  SELECT id, cluster_id, dist FROM (
    SELECT id, cluster_id, dist, row_number() OVER (PARTITION BY id ORDER BY dist ASC, cluster_id ASC) AS rn
    FROM pairs
  ) WHERE rn = 1
)
SELECT cluster_id, count(*) AS n_vectors,
round(CAST(sum(CAST(round(dist, 4) AS DECIMAL(28,4))) AS DOUBLE) / count(*), 4) AS mean_dist
FROM asn GROUP BY 1""")),
    // S10 — CAGRA graph BUILD via the CPU-adapt path (gpu_raft_cagra.cc:
    // 38-60 adapt_for_cpu; config gpu_raft_cagra_config.h): intermediate
    // 8-NN graph → detour-prune + reverse-edge merge → degree-4 cap
    // (intermediate_graph_degree → graph_degree). Pure relational algebra
    // over rounded distances ⇒ fully hash-gated
    GraftQuery(
      "cagra_build",
      (s, dir) => {
        val all = Tables
          .embeddings(s, dir)
          .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
        val inter = BruteForce
          .knnFused(all, baseVecs(s, dir).select(col("id"), col("vec")), 8, Metric.L2,
            roundDist = ROUND, excludeSelf = true)
          .select(col("qid").as("src"), col("nid").as("dst"), col("dist"))
        Cagra.optimize(inter, graphDegree = 4)
      },
      Some(s"""WITH ${Sql.cagraGraphCtes(interDegree = 8, graphDegree = 4)}
SELECT src, dst, dist, rnk FROM g""")),
    // S10 — CAGRA BUILD at the 100-TB shape: the intermediate graph comes
    // from the IVF-bucketed candidate construction (knnGraphIvfWithDist —
    // co-located cluster joins, never all pairs), then the same detour
    // prune + reverse merge. This is EXACTLY the factory arm's path
    // (Cagra.build), hash-gated end to end with deterministic centroids
    GraftQuery(
      "cagra_build_ivf",
      (s, dir) => {
        val base = baseVecs(s, dir).select(col("id"), col("vec"))
        val cents = Tables
          .embeddings(s, dir)
          .filter(col("vec_id") % 250 === 0)
          .select(col("vec_id").as("cluster_id"), col("embedding").as("centroid"))
        Cagra.build(base, cents, intermediateDegree = 8, graphDegree = 4,
          nprobe = 2, Metric.L2, ROUND)
      },
      Some(s"""WITH ${Sql.cagraGraphCtes(interDegree = 8, graphDegree = 4, ivfBucketed = true)}
SELECT src, dst, dist, rnk FROM g""")),
    // S10/S7 — the Vamana RobustPrune slack (DiskANN's build alpha,
    // src/index/diskann/diskann.cc config; default 1.2 there): the
    // detour's second leg is scaled by alpha before the drop test.
    // alpha<1 prunes MORE redundant in-clique edges, so the re-cap
    // admits longer-range survivors — the navigability lever the
    // protocol run measures. Pure relational algebra ⇒ hash-gated
    GraftQuery(
      "cagra_build_alpha",
      (s, dir) => {
        val all = Tables
          .embeddings(s, dir)
          .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
        val inter = BruteForce
          .knnFused(all, baseVecs(s, dir).select(col("id"), col("vec")), 8, Metric.L2,
            roundDist = ROUND, excludeSelf = true)
          .select(col("qid").as("src"), col("nid").as("dst"), col("dist"))
        Cagra.optimize(inter, graphDegree = 4, alpha = 0.8)
      },
      Some(s"""WITH ${Sql.cagraGraphCtes(interDegree = 8, graphDegree = 4, alpha = 0.8)}
SELECT src, dst, dist, rnk FROM g""")),
    // S7 — ONE NN-DESCENT ROUND (Dong, Charikar & Li, WWW 2011 — the
    // builder the reference configures for CAGRA's intermediate graph:
    // gpu_raft_cagra_config.h build_algo=NN_DESCENT, nn_descent_niter):
    // a deterministic arithmetic seed graph (ids carry no embedding
    // locality, so the round's improvement is real work) refined by the
    // two-hop proposal step. Bounded self-joins of id-only frames —
    // hash-gated end to end
    GraftQuery(
      "nn_descent_build",
      (s, dir) => {
        val base = baseVecs(s, dir).select(col("id"), col("vec"))
        val scatter = base
          .select(col("id"), explode(sequence(lit(1), lit(6))).as("off"))
          .select(col("id").as("src"), pmod(col("id") + col("off") * 83, lit(500L)).as("dst"))
          .filter(col("src") =!= col("dst"))
        val seed = scatter
          .join(base.select(col("id").as("dst"), col("vec")), "dst")
          .join(base.select(col("id").as("src"), col("vec").as("_sv")), "src")
          .select(col("src"), col("dst"),
            round(Metric.L2.dist(col("_sv"), col("vec")), 4).as("dist"))
        // checkpointFinal=false: this query returns the round's frame
        // straight to the harness, which never releases a cached RDD —
        // a one-round build needs no checkpoint (plan depth is bounded)
        GraphSearch.nnDescent(seed, base, degree = 6, rounds = 1,
          sampleDegree = 6, metric = Metric.L2, roundDist = ROUND,
          checkpointFinal = false)
      },
      Some("""WITH scatter AS (
  SELECT s.vec_id AS src, CAST((s.vec_id + o.off * 83) % 500 AS BIGINT) AS dst
  FROM embeddings s CROSS JOIN (SELECT unnest(range(1, 7)) AS off) o
  WHERE s.vec_id <> (s.vec_id + o.off * 83) % 500
),
seed AS (
  SELECT c.src, c.dst,
    round(sqrt(list_sum(list_transform(range(1, len(a.embedding)+1), i ->
      (CAST(a.embedding[i] AS DOUBLE) - CAST(b.embedding[i] AS DOUBLE)) *
      (CAST(a.embedding[i] AS DOUBLE) - CAST(b.embedding[i] AS DOUBLE))))), 4) AS dist
  FROM scatter c
  JOIN embeddings a ON a.vec_id = c.src
  JOIN embeddings b ON b.vec_id = c.dst
),
und AS (
  SELECT src, dst FROM (
    SELECT src, dst, dist, row_number() OVER (PARTITION BY src ORDER BY dist ASC, dst ASC) AS rn
    FROM (SELECT src, dst, min(dist) AS dist FROM (
      SELECT src, dst, dist FROM seed UNION ALL SELECT dst AS src, src AS dst, dist FROM seed
    ) GROUP BY 1, 2)
  ) WHERE rn <= 6
),
cand AS (
  SELECT DISTINCT h1.src AS src, h2.dst AS dst
  FROM und h1 JOIN und h2 ON h2.src = h1.dst
  WHERE h1.src <> h2.dst
),
sc AS (
  SELECT c.src, c.dst,
    round(sqrt(list_sum(list_transform(range(1, len(a.embedding)+1), i ->
      (CAST(a.embedding[i] AS DOUBLE) - CAST(b.embedding[i] AS DOUBLE)) *
      (CAST(a.embedding[i] AS DOUBLE) - CAST(b.embedding[i] AS DOUBLE))))), 4) AS dist
  FROM cand c
  JOIN embeddings a ON a.vec_id = c.src
  JOIN embeddings b ON b.vec_id = c.dst
)
SELECT src, dst, dist FROM (
  SELECT src, dst, dist, row_number() OVER (PARTITION BY src ORDER BY dist ASC, dst ASC) AS rn
  FROM (SELECT src, dst, min(dist) AS dist FROM (
    SELECT src, dst, dist FROM seed UNION ALL SELECT src, dst, dist FROM sc
  ) GROUP BY 1, 2)
) WHERE rn <= 6""")),
    // S7/S8 — the NAVIGABLE graph build the protocol run ships for the
    // HNSW/DiskANN arms: IVF-bucketed candidates → NN-descent refinement
    // → robust-prune (alpha) + reverse-edge merge. The full composition,
    // hash-gated with deterministic centroids — a plain kNN graph's edges
    // all point into the local clique and its beam recall saturates
    // (measured 0.651 ceiling at nb=1M); this is the published fix
    GraftQuery(
      "knn_graph_diversified",
      (s, dir) => {
        val base = baseVecs(s, dir).select(col("id"), col("vec"))
        val cents = Tables
          .embeddings(s, dir)
          .filter(col("vec_id") % 250 === 0)
          .select(col("vec_id").as("cluster_id"), col("embedding").as("centroid"))
        GraphSearch.knnGraphDiversified(base, cents, degree = 4,
          intermediateDegree = 8, nprobe = 2, descentRounds = 1,
          sampleDegree = 6, alpha = 0.9, metric = Metric.L2, roundDist = ROUND)
      },
      Some(s"""WITH ${Sql.cagraGraphCtes(interDegree = 8, graphDegree = 4,
        ivfBucketed = true, alpha = 0.9, descentRounds = 1, sampleDegree = 6)}
SELECT src, dst FROM g""")),
    // S10 — CAGRA SEARCH (itopk_size beam over the optimized graph,
    // gpu_raft_cagra.cc:48-60 CPU search): same beam mechanics as the
    // HNSW analog, ef = itopk, fixed 2-hop unrolling ⇒ hash-gated
    GraftQuery(
      "cagra_knn",
      (s, dir) => {
        val base = baseVecs(s, dir).select(col("id"), col("vec"))
        val all = Tables
          .embeddings(s, dir)
          .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
        val inter = BruteForce
          .knnFused(all, base, 8, Metric.L2, roundDist = ROUND, excludeSelf = true)
          .select(col("qid").as("src"), col("nid").as("dst"), col("dist"))
        val graph = Cagra.optimize(inter, graphDegree = 4)
          .select(col("src"), col("dst"))
        val entries = Tables
          .embeddings(s, dir)
          .filter(col("vec_id") % 250 === 0)
          .select(col("vec_id").as("nid"))
        GraphSearch.beamSearch(graph, base, queryVecs(s, dir), entries,
          K, ef = 16, iters = 2, Metric.L2, ROUND)
      },
      Some(Sql.graphBeam(ef = 16, k = K,
        graphCtes = Some(Sql.cagraGraphCtes(interDegree = 8, graphDegree = 4))))),
    // S7 capability analog — k-NN graph construction as a DataFrame
    // (src, dst, dist): the Add/Build phase of a graph index expressed as
    // an all-pairs top-k (batch NN-descent seed). All-pairs shape ⇒ fused
    // per-partition scan (BruteForce.knnFused), same output as pairs+topK
    GraftQuery(
      "knn_graph_build",
      (s, dir) => {
        val q = Tables
          .embeddings(s, dir)
          .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
        BruteForce
          .knnFused(q, baseVecs(s, dir).select(col("id"), col("vec")), 5, Metric.L2,
            roundDist = ROUND, excludeSelf = true)
          .select(col("qid").as("src"), col("nid").as("dst"), col("dist"), col("rnk"))
      },
      Some("""WITH pairs AS (
  SELECT a.vec_id AS src, b.vec_id AS dst,
    round(sqrt(list_sum(list_transform(range(1, len(a.embedding)+1), i ->
      (CAST(a.embedding[i] AS DOUBLE) - CAST(b.embedding[i] AS DOUBLE)) *
      (CAST(a.embedding[i] AS DOUBLE) - CAST(b.embedding[i] AS DOUBLE))))), 4) AS dist
  FROM embeddings a CROSS JOIN embeddings b WHERE a.vec_id <> b.vec_id
)
SELECT src, dst, dist, rnk FROM (
  SELECT src, dst, dist,
         CAST(row_number() OVER (PARTITION BY src ORDER BY dist ASC, dst ASC) AS INT) AS rnk
  FROM pairs
) WHERE rnk <= 5""")),
    // S7 — graph ANN SEARCH (batch beam over the built kNN graph — the
    // HNSW search analog, faiss_hnsw.cc:63-2941 / SURVEY §7.4): entries →
    // 2 relational hops with beam ef=16 → top-k. Fixed unrolling ⇒ the
    // beam mechanics are fully hash-gated; recall floors are ScalaTest-
    // gated with wider beams (RecallSpec)
    GraftQuery(
      "knn_graph_search",
      (s, dir) => {
        val base = baseVecs(s, dir).select(col("id"), col("vec"))
        val all = Tables
          .embeddings(s, dir)
          .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
        val graph = BruteForce
          .knnFused(all, base, 5, Metric.L2, roundDist = ROUND, excludeSelf = true)
          .select(col("qid").as("src"), col("nid").as("dst"))
        val entries = Tables
          .embeddings(s, dir)
          .filter(col("vec_id") % 250 === 0)
          .select(col("vec_id").as("nid"))
        GraphSearch.beamSearch(graph, base, queryVecs(s, dir), entries,
          K, ef = 16, iters = 2, Metric.L2, ROUND)
      },
      Some(Sql.graphBeam(ef = 16, k = K))),
    // S4/V6 × S7 — AnnIterator over a GRAPH index (the reference's HNSW
    // iterator, hnsw.h iterator workflow): the beam's ranked stream
    // consumed as rank-range pages — page 2 of size 5 is ranks (5, 10];
    // stream quality is ef-bounded exactly like the reference's iterator
    // (candidates come from the traversal, not a full scan)
    GraftQuery(
      "graph_iter_page2",
      (s, dir) => {
        val base = baseVecs(s, dir).select(col("id"), col("vec"))
        val all = Tables
          .embeddings(s, dir)
          .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
        val graph = BruteForce
          .knnFused(all, base, 5, Metric.L2, roundDist = ROUND, excludeSelf = true)
          .select(col("qid").as("src"), col("nid").as("dst"))
        val entries = Tables
          .embeddings(s, dir)
          .filter(col("vec_id") % 250 === 0)
          .select(col("vec_id").as("nid"))
        GraphSearch.beamSearch(graph, base, queryVecs(s, dir), entries,
          k = 10, ef = 16, iters = 2, Metric.L2, ROUND)
          .filter(col("rnk") > 5)
      },
      Some(Sql.graphBeam(ef = 16, k = 10)
        .replace("WHERE rnk <= 10", "WHERE rnk <= 10 AND rnk > 5"))),
    // S7 × S17 — FILTERED graph search (faiss_hnsw.cc:734-779: the bitset
    // walk keeps filtered nodes as routing waypoints; only admitted ids
    // enter the result). Batch analog: full-graph beam, `allowed` applied
    // at final collection — fixed unrolling keeps it hash-gated. Filter =
    // even-label vectors (~half the corpus).
    GraftQuery(
      "knn_graph_search_filtered",
      (s, dir) => {
        val base = baseVecs(s, dir).select(col("id"), col("vec"))
        val all = Tables
          .embeddings(s, dir)
          .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
        val graph = BruteForce
          .knnFused(all, base, 5, Metric.L2, roundDist = ROUND, excludeSelf = true)
          .select(col("qid").as("src"), col("nid").as("dst"))
        val entries = Tables
          .embeddings(s, dir)
          .filter(col("vec_id") % 250 === 0)
          .select(col("vec_id").as("nid"))
        val allowed = Tables
          .embeddings(s, dir)
          .filter(col("label") % 2 === 0)
          .select(col("vec_id").as("nid"))
        GraphSearch.beamSearchFiltered(graph, base, queryVecs(s, dir), entries, allowed,
          K, ef = 16, iters = 2, Metric.L2, ROUND)
      },
      Some(Sql.graphBeam(ef = 16, k = K, allowedPred = Some("al.label % 2 = 0")))),
    // V5 × S7 — beam-backed RangeSearch on the graph index
    // (faiss_hnsw.cc:1319-1478: range results stream from the ef-bounded
    // iterator, radius-filtered; the brute-force fallback arm is the
    // HnswIndex handle's exact rangeSearch). ef-bounded result quality,
    // fixed unroll ⇒ hash-gated.
    GraftQuery(
      "graph_range",
      (s, dir) => {
        val base = baseVecs(s, dir).select(col("id"), col("vec"))
        val all = Tables
          .embeddings(s, dir)
          .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
        val graph = BruteForce
          .knnFused(all, base, 5, Metric.L2, roundDist = ROUND, excludeSelf = true)
          .select(col("qid").as("src"), col("nid").as("dst"))
        val entries = Tables
          .embeddings(s, dir)
          .filter(col("vec_id") % 250 === 0)
          .select(col("vec_id").as("nid"))
        GraphSearch.rangeSearch(graph, base, queryVecs(s, dir), entries,
          ef = 16, iters = 2, Metric.L2, radius = 1.33, rangeFilter = 0.5, ROUND)
      },
      Some(Sql.graphBeam(ef = 16, k = K, rangeBound = Some((0.5, 1.33))))),
    // V5 × S6 — RangeSearch on the IVF index (ivf.cc:812-917): probe
    // nprobe=2 lists, scan only those, two-sided range bound. The probed
    // scan is the only base touch — at 100 TB a range query reads
    // nprobe/nlist of the files, same as kNN.
    GraftQuery(
      "ivf_range_probe",
      (s, dir) => {
        val cents = Tables
          .embeddings(s, dir)
          .filter(col("vec_id") % 250 === 0)
          .select(col("vec_id").as("cluster_id"), col("embedding").as("centroid"))
        val base = baseVecs(s, dir).select(col("id"), col("vec"))
        val index = IvfIndex.build(base, cents, ROUND)
        IvfIndex.rangeSearch(queryVecs(s, dir), index, cents, nprobe = 2, Metric.L2,
          radius = 1.33, rangeFilter = 0.5, roundDist = ROUND)
      },
      Some(s"""WITH ${Sql.ivfProbeCtes}
SELECT qid, nid, dist FROM ivfpairs WHERE dist >= 0.5 AND dist < 1.33""")),
    // S4/V6 × S6 — AnnIterator over the IVF index (ivf.cc:927-946:
    // IVFFlat/SQ8/SCANN stream iterator batches from the probed lists):
    // the ranked stream is opened on the PROBED pairs only — page 2 of
    // size 5 is ranks (5, 10] of that nprobe-bounded stream.
    GraftQuery(
      "ivf_iter_page2",
      (s, dir) => {
        val cents = Tables
          .embeddings(s, dir)
          .filter(col("vec_id") % 250 === 0)
          .select(col("vec_id").as("cluster_id"), col("embedding").as("centroid"))
        val base = baseVecs(s, dir).select(col("id"), col("vec"))
        val index = IvfIndex.build(base, cents, ROUND)
        IvfIndex
          .annIterator(queryVecs(s, dir), index, cents, nprobe = 2, Metric.L2, ROUND)
          .page(2, 5)
      },
      Some(s"""WITH ${Sql.ivfProbeCtes}
SELECT qid, nid, dist, rnk FROM (
  SELECT qid, nid, dist,
         CAST(row_number() OVER (PARTITION BY qid ORDER BY dist ASC, nid ASC) AS INT) AS rnk
  FROM ivfpairs
) WHERE rnk > 5 AND rnk <= 10""")),
    // S18 — Feder FULL topology export (feder/hnsw.h:212-257
    // HNSWOverviewData id_set + per-level json_info): one row per node of
    // the 5-NN graph — deterministic 4-adic layer, out-degree, sorted
    // adjacency as a canonical JSON array string
    GraftQuery(
      "graph_feder_overview",
      (s, dir) => {
        val base = baseVecs(s, dir).select(col("id"), col("vec"))
        val all = Tables
          .embeddings(s, dir)
          .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
        val graph = BruteForce
          .knnFused(all, base, 5, Metric.L2, roundDist = ROUND, excludeSelf = true)
          .select(col("qid").as("src"), col("nid").as("dst"))
        GraphSearch.federOverview(graph)
      },
      Some(s"""WITH g AS (
  SELECT src, dst FROM (
    SELECT a.vec_id AS src, b.vec_id AS dst,
      row_number() OVER (PARTITION BY a.vec_id ORDER BY
        round(sqrt(list_sum(list_transform(range(1, len(a.embedding)+1), i ->
          (CAST(a.embedding[i] AS DOUBLE) - CAST(b.embedding[i] AS DOUBLE)) *
          (CAST(a.embedding[i] AS DOUBLE) - CAST(b.embedding[i] AS DOUBLE))))), 4) ASC,
        b.vec_id ASC) AS rnk
    FROM embeddings a CROSS JOIN embeddings b WHERE a.vec_id <> b.vec_id
  ) WHERE rnk <= 5
)
${Sql.federOverview("g")}""")),
    // MUTUAL k-NN pairs — the reciprocal-rank adjacency SemDeDup-style
    // semantic clustering keeps (one-sided neighbors are hubness
    // artifacts): each endpoint in the other's top-5; the mutual filter is
    // one payload-free self-join on the edge key over the ranked graph
    // (exact here; the IVF-bucketed build substitutes at scale)
    GraftQuery(
      "embed_mutual_nn",
      (s, dir) => {
        val all = Tables
          .embeddings(s, dir)
          .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
        val g = BruteForce
          .knnFused(all, baseVecs(s, dir).select(col("id"), col("vec")), 5, Metric.L2,
            roundDist = ROUND, excludeSelf = true)
          .select(col("qid").as("src"), col("nid").as("dst"), col("rnk"))
        Dedup.mutualNnPairs(g)
      },
      Some(s"""WITH g AS (
  SELECT src, dst, rnk FROM (
    SELECT a.vec_id AS src, b.vec_id AS dst,
      row_number() OVER (PARTITION BY a.vec_id ORDER BY
        round(sqrt(list_sum(list_transform(range(1, len(a.embedding)+1), i ->
          (CAST(a.embedding[i] AS DOUBLE) - CAST(b.embedding[i] AS DOUBLE)) *
          (CAST(a.embedding[i] AS DOUBLE) - CAST(b.embedding[i] AS DOUBLE))))), 4) ASC,
        b.vec_id ASC) AS rnk
    FROM embeddings a CROSS JOIN embeddings b WHERE a.vec_id <> b.vec_id
  ) WHERE rnk <= 5
)
SELECT a.src AS id_a, a.dst AS id_b, CAST(a.rnk AS INT) AS rnk_ab, CAST(b.rnk AS INT) AS rnk_ba
FROM g a JOIN g b ON b.src = a.dst AND b.dst = a.src
WHERE a.src < a.dst""")),
    // the same export over the CAGRA handle's optimized graph (the
    // gpu_raft_cagra serving-contract arm) — graph CTEs shared with
    // cagra_build so the two cannot drift
    GraftQuery(
      "cagra_feder_overview",
      (s, dir) => {
        val all = Tables
          .embeddings(s, dir)
          .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
        val inter = BruteForce
          .knnFused(all, baseVecs(s, dir).select(col("id"), col("vec")), 8, Metric.L2,
            roundDist = ROUND, excludeSelf = true)
          .select(col("qid").as("src"), col("nid").as("dst"), col("dist"))
        GraphSearch.federOverview(
          Cagra.optimize(inter, graphDegree = 4).select(col("src"), col("dst")))
      },
      Some(s"""WITH ${Sql.cagraGraphCtes(interDegree = 8, graphDegree = 4)}
${Sql.federOverview("g")}""")),
    // S18 — Feder graph introspection (include/knowhere/feder/,
    // hnsw.h:212-257, test_feder.cc): graph overview (node/edge/entry
    // counts, degree histogram) + the beam's per-hop visit counts — the
    // batch analog of per-query visit traces. Deterministic fields only.
    GraftQuery(
      "graph_meta",
      (s, dir) => {
        val base = baseVecs(s, dir).select(col("id"), col("vec"))
        val all = Tables
          .embeddings(s, dir)
          .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
        val graph = BruteForce
          .knnFused(all, base, 5, Metric.L2, roundDist = ROUND, excludeSelf = true)
          .select(col("qid").as("src"), col("nid").as("dst"))
        val entries = Tables
          .embeddings(s, dir)
          .filter(col("vec_id") % 250 === 0)
          .select(col("vec_id").as("nid"))
        GraphSearch.federMeta(graph, base, queryVecs(s, dir), entries,
          ef = 16, iters = 2, Metric.L2, ROUND)
      },
      Some(s"""WITH ${Sql.qView},
g AS (
  SELECT src, dst FROM (
    SELECT a.vec_id AS src, b.vec_id AS dst,
      row_number() OVER (PARTITION BY a.vec_id ORDER BY
        round(sqrt(list_sum(list_transform(range(1, len(a.embedding)+1), i ->
          (CAST(a.embedding[i] AS DOUBLE) - CAST(b.embedding[i] AS DOUBLE)) *
          (CAST(a.embedding[i] AS DOUBLE) - CAST(b.embedding[i] AS DOUBLE))))), 4) ASC,
        b.vec_id ASC) AS rnk
    FROM embeddings a CROSS JOIN embeddings b WHERE a.vec_id <> b.vec_id
  ) WHERE rnk <= 5
),
e AS (SELECT vec_id AS nid FROM embeddings WHERE vec_id % 250 = 0),
s0 AS (
  SELECT q.qid AS qid, b.vec_id AS nid, ${Sql.l2} AS dist
  FROM q CROSS JOIN e JOIN embeddings b ON b.vec_id = e.nid
),
f0 AS (SELECT qid, nid, dist FROM (
  SELECT qid, nid, dist, row_number() OVER (PARTITION BY qid ORDER BY dist ASC, nid ASC) AS rn
  FROM s0
) WHERE rn <= 16),
c1 AS (SELECT DISTINCT f.qid AS qid, g.dst AS nid FROM f0 f JOIN g ON g.src = f.nid),
s1 AS (
  SELECT c.qid AS qid, b.vec_id AS nid, ${Sql.l2} AS dist
  FROM c1 c JOIN q ON q.qid = c.qid JOIN embeddings b ON b.vec_id = c.nid
),
u1 AS (SELECT DISTINCT qid, nid, dist FROM (SELECT * FROM f0 UNION ALL SELECT * FROM s1)),
f1 AS (SELECT qid, nid, dist FROM (
  SELECT qid, nid, dist, row_number() OVER (PARTITION BY qid ORDER BY dist ASC, nid ASC) AS rn
  FROM u1
) WHERE rn <= 16),
c2 AS (SELECT DISTINCT f.qid AS qid, g.dst AS nid FROM f1 f JOIN g ON g.src = f.nid)
SELECT stat, value FROM (
  SELECT 'graph_nodes' AS stat, count(DISTINCT src) AS value FROM g
  UNION ALL SELECT 'graph_edges', count(*) FROM g
  UNION ALL SELECT 'entry_points', count(*) FROM e
  UNION ALL SELECT 'degree_' || CAST(degree AS VARCHAR), count(*)
    FROM (SELECT src, count(*) AS degree FROM g GROUP BY src) GROUP BY degree
  UNION ALL SELECT 'hop1_visits', count(*) FROM c1
  UNION ALL SELECT 'hop2_visits', count(*) FROM c2
)""")),
    // S7 HNSW_SQ analog (faiss_hnsw.cc:2928-2939 registrations, refine
    // loop 739-860): the beam traverses on SQ8-reconstructed vectors —
    // the memory-constrained config — and only the final frontier is
    // reranked on raw data. Deterministic quantizer ⇒ hash-gated.
    GraftQuery(
      "knn_graph_search_sq",
      (s, dir) => {
        val base = baseVecs(s, dir).select(col("id"), col("vec"))
        val all = Tables
          .embeddings(s, dir)
          .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
        val graph = BruteForce
          .knnFused(all, base, 5, Metric.L2, roundDist = ROUND, excludeSelf = true)
          .select(col("qid").as("src"), col("nid").as("dst"))
        val entries = Tables
          .embeddings(s, dir)
          .filter(col("vec_id") % 250 === 0)
          .select(col("vec_id").as("nid"))
        val stats = Quantization.sq8Train(base)
        val approx = base
          .crossJoin(broadcast(stats))
          .select(col("id"),
            Quantization.sq8Recon(
              Quantization.sq8Code(col("vec"), col("mn"), col("mx")),
              col("mn"), col("mx")).as("vec"))
        GraphSearch.beamSearchRefined(graph, approx, base, queryVecs(s, dir),
          entries, K, ef = 16, iters = 2, Metric.L2, ROUND)
      },
      Some(Sql.graphBeamQuant(ef = 16, k = K, "sq"))),
    // S7 × V6/S15 — the QUANTIZED beam consumed as a refined iterator
    // (index_node.h:538-567 refine loop over an approx-ordered stream):
    // the SQ-tier frontier ranks the stream, page 2 over-fetches by
    // refine_ratio and exact-rescores against raw vectors, emitting in
    // exact order (retain_iterator_order)
    GraftQuery(
      "graph_sq_iter_refine_page2",
      (s, dir) => {
        val base = baseVecs(s, dir).select(col("id"), col("vec"))
        val all = Tables
          .embeddings(s, dir)
          .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
        val graph = BruteForce
          .knnFused(all, base, 5, Metric.L2, roundDist = ROUND, excludeSelf = true)
          .select(col("qid").as("src"), col("nid").as("dst"))
        val entries = Tables
          .embeddings(s, dir)
          .filter(col("vec_id") % 250 === 0)
          .select(col("vec_id").as("nid"))
        val stats = Quantization.sq8Train(base)
        val approx = base
          .crossJoin(broadcast(stats))
          .select(col("id"),
            Quantization.sq8Recon(
              Quantization.sq8Code(col("vec"), col("mn"), col("mx")),
              col("mn"), col("mx")).as("vec"))
        GraphSearch
          .beamIterator(graph, approx, queryVecs(s, dir), entries,
            ef = 16, iters = 2, Metric.L2, ROUND)
          .refinedPage(queryVecs(s, dir), base, p = 2, pageSize = 5,
            refineRatio = 1, Metric.L2, ROUND)
      },
      Some(Sql.graphBeamQuant(ef = 16, k = K, "sq", iterPage = Some((2, 5, 1))))),
    // S7 HNSW_PQ analog: beam on PQ-reconstructed vectors (explicit
    // every-25th-vector codebook — recon-L2 equals ADC), exact refine of
    // the final frontier only.
    GraftQuery(
      "knn_graph_search_pq",
      (s, dir) => {
        val base = baseVecs(s, dir).select(col("id"), col("vec"))
        val all = Tables
          .embeddings(s, dir)
          .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
        val graph = BruteForce
          .knnFused(all, base, 5, Metric.L2, roundDist = ROUND, excludeSelf = true)
          .select(col("qid").as("src"), col("nid").as("dst"))
        val entries = Tables
          .embeddings(s, dir)
          .filter(col("vec_id") % 250 === 0)
          .select(col("vec_id").as("nid"))
        val model = ProductQuant.explicitModel(base, m = 8, ksub = 16, step = 25)
        val approx = base.select(col("id"),
          ProductQuant.reconExpr(
            ProductQuant.encodeExpr(col("vec"), model), model).as("vec"))
        GraphSearch.beamSearchRefined(graph, approx, base, queryVecs(s, dir),
          entries, K, ef = 16, iters = 2, Metric.L2, ROUND)
      },
      Some(Sql.graphBeamQuant(ef = 16, k = K, "pq"))),
    // S7 HNSW_PRQ analog: two-stage product-RESIDUAL quantization — the
    // beam traverses on recon1 + recon2(residual), exact refine of the
    // final frontier. Explicit codebooks for both stages (stage 2 codes
    // the float residual frame) keep it hash-gated.
    GraftQuery(
      "knn_graph_search_prq",
      (s, dir) => {
        val base = baseVecs(s, dir).select(col("id"), col("vec"))
        val all = Tables
          .embeddings(s, dir)
          .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
        val graph = BruteForce
          .knnFused(all, base, 5, Metric.L2, roundDist = ROUND, excludeSelf = true)
          .select(col("qid").as("src"), col("nid").as("dst"))
        val entries = Tables
          .embeddings(s, dir)
          .filter(col("vec_id") % 250 === 0)
          .select(col("vec_id").as("nid"))
        val m1 = ProductQuant.explicitModel(base, m = 8, ksub = 16, step = 25)
        val m2 = ProductQuant.explicitModel(
          ProductQuant.residualFrame(base, m1), m = 8, ksub = 16, step = 25)
        val approx = ProductQuant.prqReconTier(base, m1, m2)
        GraphSearch.beamSearchRefined(graph, approx, base, queryVecs(s, dir),
          entries, K, ef = 16, iters = 2, Metric.L2, ROUND)
      },
      Some(Sql.graphBeamQuant(ef = 16, k = K, "prq"))),
    // S6 IVF_SQ8 — SQ8 codes inside probed IVF lists + exact rerank
    // (ivf.cc:1244-1276): the quantizer rides the coarse index
    GraftQuery(
      "ivf_sq8_knn",
      (s, dir) => {
        val cents = Tables
          .embeddings(s, dir)
          .filter(col("vec_id") % 250 === 0)
          .select(col("vec_id").as("cluster_id"), col("embedding").as("centroid"))
        val base = baseVecs(s, dir).select(col("id"), col("vec"))
        val index = IvfIndex.build(base, cents, ROUND)
        IvfIndex.searchSq8(queryVecs(s, dir), index, cents, K, nprobe = 2, reorderK = 30, ROUND)
      },
      Some(s"""WITH ${Sql.qView},
cc AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id % 250 = 0),
asn AS (
  SELECT vec_id, cid FROM (
    SELECT b.vec_id, cc.cid,
      row_number() OVER (PARTITION BY b.vec_id ORDER BY
        round(sqrt(list_sum(list_transform(range(1, len(b.embedding)+1), i ->
          (CAST(b.embedding[i] AS DOUBLE) - CAST(cc.cv[i] AS DOUBLE)) *
          (CAST(b.embedding[i] AS DOUBLE) - CAST(cc.cv[i] AS DOUBLE))))), 4) ASC, cc.cid ASC) AS rn
    FROM embeddings b CROSS JOIN cc
  ) WHERE rn = 1
),
probes AS (
  SELECT qid, cid FROM (
    SELECT q.qid, cc.cid,
      row_number() OVER (PARTITION BY q.qid ORDER BY
        round(sqrt(list_sum(list_transform(range(1, len(q.qv)+1), i ->
          (CAST(q.qv[i] AS DOUBLE) - CAST(cc.cv[i] AS DOUBLE)) *
          (CAST(q.qv[i] AS DOUBLE) - CAST(cc.cv[i] AS DOUBLE))))), 4) ASC, cc.cid ASC) AS rn
    FROM q CROSS JOIN cc
  ) WHERE rn <= 2
),
stats AS (
  SELECT CAST(r.range AS INT) AS i,
         min(CAST(b.embedding[CAST(r.range AS INT)] AS DOUBLE)) AS mn,
         max(CAST(b.embedding[CAST(r.range AS INT)] AS DOUBLE)) AS mx
  FROM embeddings b CROSS JOIN range(1, 65) r GROUP BY 1
),
sv AS (SELECT list(mn ORDER BY i) AS mn, list(mx ORDER BY i) AS mx FROM stats),
recon AS (
  SELECT b.vec_id, list_transform(range(1, len(b.embedding)+1), i ->
    s.mn[i] + (LEAST(255.0, GREATEST(0.0,
      CASE WHEN s.mx[i] = s.mn[i] THEN 0.0
           ELSE floor((CAST(b.embedding[i] AS DOUBLE) - s.mn[i]) / (s.mx[i] - s.mn[i]) * 255.0) END
    )) + 0.5) * (s.mx[i] - s.mn[i]) / 255.0) AS rv
  FROM embeddings b CROSS JOIN sv s
),
cand AS (
  SELECT qid, nid, row_number() OVER (PARTITION BY qid ORDER BY dist, nid) AS crnk FROM (
    SELECT q.qid AS qid, a.vec_id AS nid,
      round(sqrt(list_sum(list_transform(range(1, len(q.qv)+1), i ->
        (CAST(q.qv[i] AS DOUBLE) - r.rv[i]) * (CAST(q.qv[i] AS DOUBLE) - r.rv[i])))), 4) AS dist
    FROM q
    JOIN probes p ON p.qid = q.qid
    JOIN asn a ON a.cid = p.cid
    JOIN recon r ON r.vec_id = a.vec_id)
),
rer AS (
  SELECT c2.qid AS qid, c2.nid AS nid, ${Sql.l2} AS dist
  FROM cand c2 JOIN q ON q.qid = c2.qid JOIN embeddings b ON b.vec_id = c2.nid
  WHERE c2.crnk <= 30
)
SELECT qid, nid, dist, rnk FROM (
  SELECT qid, nid, dist,
         CAST(row_number() OVER (PARTITION BY qid ORDER BY dist ASC, nid ASC) AS INT) AS rnk
  FROM rer
) WHERE rnk <= $K""")),
    // S4/V6 — AnnIterator with RESUME STATE (index_node.h:451-679): the
    // ranked stream persists at open(); page p is a cached-scan rank
    // filter, never a recompute of the top-(p·size) prefix
    GraftQuery(
      "iter_resume_page3",
      (s, dir) => {
        val sess = AnnIteratorOp.open(
          queryVecs(s, dir), baseVecs(s, dir).select(col("id"), col("vec")),
          Metric.L2, ROUND)
        sess.page(3, 5)
      },
      Some(Sql.knn(Sql.l2, desc = false, k = 15)
        .replace("WHERE rnk <= 15", "WHERE rnk <= 15 AND rnk > 10"))),
    // S15/V6 — iterator REFINE (iterator_refine_ratio/retain_iterator_order,
    // config.h:602-612, index_node.h:538-567): approx (SQ8-recon) ordered
    // stream, page 2 over-fetched ×3, exact-reranked, emitted exact-ordered
    GraftQuery(
      "iter_refine_page2",
      (s, dir) => {
        val base = baseVecs(s, dir).select(col("id"), col("vec"))
        val stats = Quantization.sq8Train(base)
        val coded = base
          .crossJoin(broadcast(stats))
          .select(col("id"), col("vec"),
            Quantization.sq8Recon(
              Quantization.sq8Code(col("vec"), col("mn"), col("mx")),
              col("mn"), col("mx")).as("recon"))
        val sess = AnnIteratorOp.open(queryVecs(s, dir), coded, Metric.L2, ROUND,
          Some(graft.functions.VectorFunctions.l2(col("qvec"), col("recon"))))
        sess.refinedPage(queryVecs(s, dir), base, p = 2, pageSize = 10,
          refineRatio = 3, Metric.L2, ROUND)
      },
      Some(Sql.iterRefine(page = 2, pageSize = 10, refineRatio = 3))),
    // S4/V6 — AnnIterator analog: the sorted neighbor stream consumed as
    // pages; page 2 (ranks 11..20) of the exact L2 stream
    GraftQuery(
      "iter_page2",
      (s, dir) =>
        BruteForce
          .knn(queryVecs(s, dir), baseVecs(s, dir), 20, Metric.L2, roundDist = ROUND)
          .filter(col("rnk") > 10),
      Some(Sql.knn(Sql.l2, desc = false, k = 20).replace("WHERE rnk <= 20", "WHERE rnk <= 20 AND rnk > 10"))),
    // S4/V6 — LAZY iterator pages (index_node.h:648-669 partial-sort-in-
    // chunks): open persists unranked distances; page 2 partial-sorts via
    // the bounded-heap top-20, never a full per-query sort
    GraftQuery(
      "iter_lazy_page2",
      (s, dir) => {
        val sess = AnnIteratorOp.openLazy(
          queryVecs(s, dir), baseVecs(s, dir).select(col("id"), col("vec")),
          Metric.L2, ROUND)
        sess.page(2, 10)
      },
      Some(Sql.knn(Sql.l2, desc = false, k = 20).replace("WHERE rnk <= 20", "WHERE rnk <= 20 AND rnk > 10"))),
    // V10/V11 — Count/Dim/meta: index metadata describe
    GraftQuery(
      "index_meta",
      (s, dir) =>
        Tables
          .embeddings(s, dir)
          .agg(
            count(lit(1)).as("cnt"),
            max(size(col("embedding"))).as("dim"),
            min(col("vec_id")).as("min_id"),
            max(col("vec_id")).as("max_id")),
      Some("""SELECT count(*) AS cnt, CAST(max(len(embedding)) AS INT) AS dim,
min(vec_id) AS min_id, max(vec_id) AS max_id FROM embeddings""")),
    // S6 via k-means TRAIN, hash-gated: Lloyd restated on an exact integer
    // grid (GridKMeans) so the oracle can state the identical centroids,
    // assignment, and probed search — closes the round-5 inventory's only
    // no_oracle row. The float LocalKMeans trainer stays recall-gated in
    // ScalaTest (RecallSpec), as its driver-side float arithmetic is
    // exactly what a SQL oracle cannot restate.
    GraftQuery(
      "ivf_kmeans_knn",
      (s, dir) => {
        val base = baseVecs(s, dir).select(col("id"), col("vec"))
        val cents = GridKMeans.train(base, stride = 250L, iters = 2)
        GridKMeans.search(queryVecs(s, dir), base, cents, K, nprobe = 4)
      },
      Some(Sql.gridKmeansKnn(stride = 250, iters = 2, nprobe = 4))),
    // S1 + input_begin_id — id-offset rebasing of the result neighbor ids
    // (brute_force.cc:249-253, tested test_bruteforce.cc:257)
    GraftQuery(
      "bf_knn_l2_rebase",
      (s, dir) =>
        BruteForce.knn(queryVecs(s, dir), baseVecs(s, dir), K, Metric.L2,
          roundDist = ROUND, idOffset = 1000000L),
      Some(Sql.knn(Sql.l2, desc = false)
        .replace("SELECT qid, nid, dist, rnk FROM (",
          "SELECT qid, nid + 1000000 AS nid, dist, rnk FROM ("))),
    // S6 IVF_PQ quantizer — product quantization with ADC + exact rerank.
    // Deterministic every-25th-vector codebooks make the ADC+rerank
    // MECHANICS hash-gated (VERDICT r1 #9); kmeans-trained codebooks stay
    // recall-gated in ScalaTest (RecallSpec)
    GraftQuery(
      "pq_knn_rerank",
      (s, dir) => {
        val base = baseVecs(s, dir).select(col("id"), col("vec"))
        val model = ProductQuant.explicitModel(base, m = 8, ksub = 16, step = 25)
        ProductQuant.pqKnn(queryVecs(s, dir), base, model, K, reorderK = 50, ROUND)
      },
      Some(Sql.pqKnn(probed = false))),
    // S6 PQ ENCODE at nbits=8 (ksub=256, m=dim/2 — the fidelity the
    // reference's `pq_code_budget_gb` buys for DiskANN steering,
    // `diskann.cc` build config; m/nbits ranges benchmark_float_qps.cpp:
    // 400-401): hash-gates the native PqEncode kernel (plans/PqExpressions)
    // at the m·ksub scale where the relational argmin tree stopped JIT-
    // compiling — 8,192 codeword distances per row as ONE compiled loop.
    // Deterministic first-256-vectors codebook ⇒ the full code assignment
    // is SQL-stateable; ties take the first minimum (ORDER BY d, c).
    // Output is exploded to (id, s, code) scalar rows — the driver's
    // comparator sorts columns with pandas and cannot hash ARRAY cells.
    GraftQuery(
      "pq_encode_codes",
      (s, dir) => {
        val base = baseVecs(s, dir).select(col("id"), col("vec"))
        val model = ProductQuant.explicitModel(base, m = 32, ksub = 256, step = 1)
        base
          .select(col("id"),
            posexplode(ProductQuant.encodeExpr(col("vec"), model)))
          .select(col("id"), col("pos").as("s"), col("col").as("code"))
      },
      Some("""WITH cb AS (
  SELECT CAST(vec_id AS INT) AS c, embedding AS cv FROM embeddings WHERE vec_id < 256
)
SELECT b.vec_id AS id, CAST(s.s AS INT) AS s, cb.c AS code
FROM embeddings b
CROSS JOIN (SELECT unnest(range(0, 32)) AS s) s
CROSS JOIN cb
QUALIFY row_number() OVER (PARTITION BY b.vec_id, s.s
  ORDER BY list_sum(list_transform(range(1, 3), j ->
    (CAST(b.embedding[s.s*2 + j] AS DOUBLE) - CAST(cb.cv[s.s*2 + j] AS DOUBLE)) *
    (CAST(b.embedding[s.s*2 + j] AS DOUBLE) - CAST(cb.cv[s.s*2 + j] AS DOUBLE)))) ASC,
    cb.c ASC) = 1""")),
    // S6 IVF_PQ composed — PQ ADC inside probed IVF lists + exact rerank
    // (ivf.cc:1244-1276; m/nbits per benchmark_float_qps.cpp:400-401),
    // deterministic coarse centroids + codebooks ⇒ fully hash-gated
    GraftQuery(
      "ivf_pq_knn",
      (s, dir) => {
        val base = baseVecs(s, dir).select(col("id"), col("vec"))
        val cents = Tables
          .embeddings(s, dir)
          .filter(col("vec_id") % 250 === 0)
          .select(col("vec_id").as("cluster_id"), col("embedding").as("centroid"))
        val index = IvfIndex.build(base, cents, ROUND)
        val model = ProductQuant.explicitModel(base, m = 8, ksub = 16, step = 25)
        IvfIndex.searchPq(queryVecs(s, dir), index, cents, model, K,
          nprobe = 2, reorderK = 50, ROUND)
      },
      Some(Sql.pqKnn(probed = true))),
    // V8 × V14 — the static capability surface under the hash gate
    // (knowhere_check.h:22-41 tables; per-index HasRawData incl. the
    // metric-dependent sparse rule, sparse_index_node.cc:541-543)
    GraftQuery(
      "capability_table",
      (s, _) => {
        import s.implicits._
        Seq(
          ("FLAT", "l2"), ("BIN_FLAT", "hamming"), ("IVF_FLAT", "l2"),
          ("IVF_FLAT_CC", "l2"), ("BIN_IVF_FLAT", "hamming"),
          ("IVF_SQ8", "l2"), ("IVF_SQ_CC", "l2"), ("IVF_PQ", "l2"),
          ("SCANN", "l2"), ("HNSW", "l2"), ("HNSW", "cosine"),
          ("HNSW_SQ", "l2"), ("HNSW_PQ", "l2"), ("HNSW_PRQ", "l2"),
          ("DISKANN", "l2"), ("GPU_CAGRA", "l2"), ("GPU_CAGRA", "cosine"),
          ("SPARSE_INVERTED_INDEX", "ip"),
          ("SPARSE_INVERTED_INDEX", "bm25"),
          ("SPARSE_INVERTED_INDEX_CC", "ip"), ("SPARSE_WAND", "ip"),
          ("SPARSE_WAND", "bm25"), ("SPARSE_WAND_CC", "bm25")
        ).map { case (t, m) =>
          (t, m, Capabilities.supportsMetric(t, m), Capabilities.hasRawData(t, m),
            Capabilities.supportsConcurrentAppend(t), Capabilities.supportsMmap(t),
            Capabilities.versionSupported(Capabilities.CurrentVersion) &&
              Capabilities.versionSupported(Capabilities.MinVersion),
            Capabilities.supportsAdditionalScalar(t, isMvOnly = true))
        }.toDF("index_type", "metric", "supports_metric", "has_raw_data",
          "concurrent_append", "supports_mmap", "version_ok", "mv_scalar")
      },
      Some("""SELECT * FROM (VALUES
('FLAT', 'l2', true, true, true, true, true, false),
('BIN_FLAT', 'hamming', true, true, false, true, true, false),
('IVF_FLAT', 'l2', true, true, true, true, true, false),
('IVF_FLAT_CC', 'l2', true, true, true, true, true, false),
('BIN_IVF_FLAT', 'hamming', true, true, false, true, true, false),
('IVF_SQ8', 'l2', true, true, false, true, true, false),
('IVF_SQ_CC', 'l2', true, true, true, true, true, false),
('IVF_PQ', 'l2', true, true, false, true, true, false),
('SCANN', 'l2', true, true, false, true, true, false),
('HNSW', 'l2', true, true, false, true, true, true),
('HNSW', 'cosine', true, true, false, true, true, true),
('HNSW_SQ', 'l2', true, true, false, true, true, true),
('HNSW_PQ', 'l2', true, true, false, true, true, true),
('HNSW_PRQ', 'l2', true, true, false, true, true, true),
('DISKANN', 'l2', true, true, false, false, true, false),
('GPU_CAGRA', 'l2', true, false, false, false, true, false),
('GPU_CAGRA', 'cosine', true, false, false, false, true, false),
('SPARSE_INVERTED_INDEX', 'ip', true, true, true, true, true, false),
('SPARSE_INVERTED_INDEX', 'bm25', true, false, true, true, true, false),
('SPARSE_INVERTED_INDEX_CC', 'ip', true, true, true, true, true, false),
('SPARSE_WAND', 'ip', true, true, true, true, true, false),
('SPARSE_WAND', 'bm25', true, false, true, true, true, false),
('SPARSE_WAND_CC', 'bm25', true, false, true, true, true, false)
) AS t(index_type, metric, supports_metric, has_raw_data, concurrent_append, supports_mmap, version_ok, mv_scalar)""")),
    // S7/S8 graph BUILD at the 100-TB shape: candidates from the nprobe
    // nearest IVF lists only (co-located shuffle join on cluster_id) —
    // never an all-pairs scan; deterministic centroids ⇒ hash-gated
    GraftQuery(
      "knn_graph_build_ivf",
      (s, dir) => {
        val base = baseVecs(s, dir).select(col("id"), col("vec"))
        val cents = Tables
          .embeddings(s, dir)
          .filter(col("vec_id") % 250 === 0)
          .select(col("vec_id").as("cluster_id"), col("embedding").as("centroid"))
        GraphSearch.knnGraphIvf(base, cents, degree = 5, nprobe = 2, Metric.L2, ROUND)
      },
      Some(s"""WITH c AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id % 250 = 0),
asn AS (
  SELECT vec_id, cid FROM (
    SELECT b.vec_id, c.cid,
      row_number() OVER (PARTITION BY b.vec_id ORDER BY
        round(sqrt(list_sum(list_transform(range(1, len(b.embedding)+1), i ->
          (CAST(b.embedding[i] AS DOUBLE) - CAST(c.cv[i] AS DOUBLE)) *
          (CAST(b.embedding[i] AS DOUBLE) - CAST(c.cv[i] AS DOUBLE))))), 4) ASC, c.cid ASC) AS rn
    FROM embeddings b CROSS JOIN c
  ) WHERE rn = 1
),
probes AS (
  SELECT qid, cid FROM (
    SELECT qq.vec_id AS qid, c.cid,
      row_number() OVER (PARTITION BY qq.vec_id ORDER BY
        round(sqrt(list_sum(list_transform(range(1, len(qq.embedding)+1), i ->
          (CAST(qq.embedding[i] AS DOUBLE) - CAST(c.cv[i] AS DOUBLE)) *
          (CAST(qq.embedding[i] AS DOUBLE) - CAST(c.cv[i] AS DOUBLE))))), 4) ASC, c.cid ASC) AS rn
    FROM embeddings qq CROSS JOIN c
  ) WHERE rn <= 2
),
pairs AS (
  SELECT q.vec_id AS src, b.vec_id AS dst,
    round(sqrt(list_sum(list_transform(range(1, len(q.embedding)+1), i ->
      (CAST(q.embedding[i] AS DOUBLE) - CAST(b.embedding[i] AS DOUBLE)) *
      (CAST(q.embedding[i] AS DOUBLE) - CAST(b.embedding[i] AS DOUBLE))))), 4) AS dist
  FROM embeddings q
  JOIN probes p ON p.qid = q.vec_id
  JOIN asn a ON a.cid = p.cid
  JOIN embeddings b ON b.vec_id = a.vec_id
  WHERE q.vec_id <> b.vec_id
)
SELECT src, dst FROM (
  SELECT src, dst, row_number() OVER (PARTITION BY src ORDER BY dist ASC, dst ASC) AS rnk
  FROM pairs
) WHERE rnk <= 5""")),
    // S8 DISKANN — memory/SSD split (diskann.cc:160-707): beam traversal
    // on in-memory PQ codes (cached_beam_search analog), search list of
    // size L, exact rerank from the raw "SSD" tier. Deterministic graph +
    // codebooks + entries ⇒ the full search is hash-gated; trained-PQ
    // recall rides RecallSpec.
    GraftQuery(
      "diskann_knn",
      (s, dir) => {
        val base = baseVecs(s, dir).select(col("id"), col("vec"))
        val model = ProductQuant.explicitModel(base, m = 8, ksub = 16, step = 25)
        val entries = Tables
          .embeddings(s, dir)
          .filter(col("vec_id") % 250 === 0)
          .select(col("vec_id").as("nid"))
        val idx = DiskAnn.build(base, model, entries,
          degree = 5, searchListSize = 16, beamIters = 2, ROUND)
        idx.search(queryVecs(s, dir), K)
      },
      Some(Sql.diskannBeam(ef = 16, k = K))),
    // S8 DISKANN at the 100-TB build shape: the Vamana-analog graph comes
    // from the IVF-bucketed candidate construction (knnGraphIvf — bounded
    // candidate pools, the reference's diskann.cc:348-360 contract), not
    // the O(nb²) exact graph. Deterministic centroids keep the whole
    // build+search under the hash gate.
    GraftQuery(
      "diskann_knn_ivf",
      (s, dir) => {
        val base = baseVecs(s, dir).select(col("id"), col("vec"))
        val model = ProductQuant.explicitModel(base, m = 8, ksub = 16, step = 25)
        val cents = Tables
          .embeddings(s, dir)
          .filter(col("vec_id") % 250 === 0)
          .select(col("vec_id").as("cluster_id"), col("embedding").as("centroid"))
        val entries = Tables
          .embeddings(s, dir)
          .filter(col("vec_id") % 250 === 0)
          .select(col("vec_id").as("nid"))
        val idx = DiskAnn.buildIvf(base, model, entries, cents,
          degree = 5, nprobe = 2, searchListSize = 16, beamIters = 2, roundDist = ROUND)
        idx.search(queryVecs(s, dir), K)
      },
      Some(Sql.diskannBeam(ef = 16, k = K, ivfGraph = true)))
  )
}
