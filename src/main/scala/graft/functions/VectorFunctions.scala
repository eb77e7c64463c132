package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Distance kernels over `ARRAY<FLOAT>` columns, as pure Catalyst column
  * expressions (whole-stage-codegen'd higher-order functions — no UDFs).
  *
  * Mirrors the reference's kernel surface (`src/simd/hook.cc`,
  * `src/common/comp/brute_force.cc:104-265`): L2, IP, COSINE (norm-cached),
  * HAMMING, JACCARD, SUB/SUPERSTRUCTURE over sign-bit-packed vectors, and the
  * sorted sparse dot product. The reference's runtime SIMD dispatch
  * (`hook.cc:1-392`) maps to Tungsten codegen here.
  *
  * Determinism contract: every kernel casts elements to DOUBLE and folds
  * left-to-right, so results are bit-reproducible across runs and engines —
  * required by the DuckDB correctness oracle.
  */
object VectorFunctions {

  import org.apache.spark.sql.GraftExpr

  /** Sum of f(a_i, b_i) folded left-to-right in DOUBLE. */
  private def zipSum(a: Column, b: Column, f: (Column, Column) => Column): Column =
    aggregate(zip_with(a, b, f), lit(0.0d), (acc, x) => acc + x)

  /** Squared L2 distance (reference `fvec_L2sqr`, distances_ref.cc) as a
    * codegen'd native expression (the SIMD-kernel analog — see
    * graft.plans.VecL2Sq). Bit-identical to [[l2SqHof]]. */
  def l2Sq(a: Column, b: Column): Column =
    GraftExpr.column(
      graft.plans.VecL2Sq(GraftExpr.expression(a), GraftExpr.expression(b)))

  /** Interpreted higher-order-function formulation (kept as the
    * cross-check reference for the codegen kernel). */
  def l2SqHof(a: Column, b: Column): Column =
    zipSum(a, b, (x, y) => {
      val d = x.cast("double") - y.cast("double")
      d * d
    })

  /** L2 distance. Knowhere's L2 metric returns *squared* distance
    * (faiss convention); we expose both. */
  def l2(a: Column, b: Column): Column = sqrt(l2Sq(a, b))

  /** Inner product (reference `fvec_inner_product`), codegen'd. */
  def dot(a: Column, b: Column): Column =
    GraftExpr.column(
      graft.plans.VecDot(GraftExpr.expression(a), GraftExpr.expression(b)))

  /** Interpreted HOF inner product (cross-check reference). */
  def dotHof(a: Column, b: Column): Column =
    zipSum(a, b, (x, y) => x.cast("double") * y.cast("double"))

  /** L2 norm (reference `fvec_norm_L2sqr`, GetVecNorms
    * `brute_force.cc:66-101`). */
  def normL2(a: Column): Column = sqrt(dot(a, a))

  /** L2-normalize to unit length (the reference's NormalizeVecs
    * preprocessing, `norm.h` — Knowhere normalizes inputs so COSINE can run
    * as IP): elements divide by the double-precision norm, then round back
    * to the FLOAT storage grid. Map-side; zero vectors are the caller's
    * contract (they produce non-finite elements, as in the reference).
    * NOTE: the norm is an outer expression inside the per-element lambda,
    * so it re-evaluates per element (dim× overhead) — hot paths should
    * bind the norm to its own column first and use [[normalizeL2Pre]]. */
  def normalizeL2(a: Column): Column = {
    val n = normL2(a)
    transform(a, x => (x.cast("double") / n).cast("float"))
  }

  /** [[normalizeL2]] with the norm already bound to an attribute (computed
    * in a prior projection) — each element pays one divide. */
  def normalizeL2Pre(a: Column, n: Column): Column =
    transform(a, x => (x.cast("double") / n).cast("float"))

  /** Cosine *similarity* (higher = closer), as in Knowhere's COSINE metric:
    * ip / (|a|·|b|) with norms precomputable (`brute_force.cc:183-197`). */
  def cosineSim(a: Column, b: Column): Column =
    dot(a, b) / (normL2(a) * normL2(b))

  /** Cosine similarity with precomputed norms (index-side `norm` column —
    * the "cached norms" optimization, SURVEY.md §4). */
  def cosineSimPre(a: Column, b: Column, normA: Column, normB: Column): Column =
    dot(a, b) / (normA * normB)

  // ----- reduced-precision storage casts ------------------------------------
  // The reference's fp16/bf16/int8 element types (`operands.h:48-147`) are
  // STORAGE types: compute paths mock them through fp32 conversion
  // (`operands.h:180-198` MockData, `src/index/index_node_data_mock_wrapper
  // .cc:1-88`, `utils.h:112-177`). The Spark rendering: a storage-cast
  // column expression that rounds each element to the target type's
  // representable grid (round-to-nearest-EVEN, IEEE default), while the
  // column stays DOUBLE for the (fp32-and-wider) compute path — identical
  // semantics, SQL-expressible, so the oracle can reproduce it.

  /** Round x to `mBits` mantissa bits with gradual underflow below
    * 2^-minNormalExp (the target type's min normal). Out-of-range overflow
    * (|x| > fp16 max 65504) is out of scope — unit-scale embeddings. */
  private def storageRound(x: Column, mBits: Int, minNormalExp: Int): Column = {
    val xd = x.cast("double")
    val absx = abs(xd)
    val e = when(absx >= pow(lit(2.0d), lit(-minNormalExp.toDouble)),
      lit(mBits.toDouble) - floor(log2(absx)))
      .otherwise(lit((mBits + minNormalExp).toDouble))
    val scale = pow(lit(2.0d), e)
    bround(xd * scale) / scale
  }

  /** IEEE half-precision storage (10 mantissa bits, min normal 2^-14). */
  def fp16Storage(v: Column): Column = transform(v, x => storageRound(x, 10, 14))

  /** bfloat16 storage (7 mantissa bits, fp32 exponent range). */
  def bf16Storage(v: Column): Column = transform(v, x => storageRound(x, 7, 126))

  // ----- TRUE half-width packed storage -------------------------------------
  // The grid casts above keep fp16/bf16 VALUES on 4-byte floats; these pack
  // the same values into dim*2-byte BINARY columns (graft.plans.Half —
  // operands.h:48-147 real 2-byte storage), halving the scan payload. The
  // packed kernels decode inline in codegen and are bit-identical to the
  // grid-cast compute path, so both renderings share one oracle.

  /** ARRAY<FLOAT|DOUBLE> → BINARY(dim*2), RNE-narrowed to binary16. */
  def packFp16(v: Column): Column =
    GraftExpr.column(graft.plans.VecPackHalf(GraftExpr.expression(v), bf16 = false))

  /** ARRAY<FLOAT|DOUBLE> → BINARY(dim*2), RNE-narrowed to bfloat16. */
  def packBf16(v: Column): Column =
    GraftExpr.column(graft.plans.VecPackHalf(GraftExpr.expression(v), bf16 = true))

  /** BINARY → ARRAY<FLOAT> (exact decode). */
  def unpackFp16(v: Column): Column =
    GraftExpr.column(graft.plans.VecUnpackHalf(GraftExpr.expression(v), bf16 = false))

  def unpackBf16(v: Column): Column =
    GraftExpr.column(graft.plans.VecUnpackHalf(GraftExpr.expression(v), bf16 = true))

  /** Squared L2 over packed binary16 buffers (decode-inline). */
  def l2SqPackedFp16(a: Column, b: Column): Column =
    GraftExpr.column(graft.plans.VecL2SqHalf(
      GraftExpr.expression(a), GraftExpr.expression(b), bf16 = false))

  def l2SqPackedBf16(a: Column, b: Column): Column =
    GraftExpr.column(graft.plans.VecL2SqHalf(
      GraftExpr.expression(a), GraftExpr.expression(b), bf16 = true))

  /** Inner product over packed buffers. */
  def dotPackedFp16(a: Column, b: Column): Column =
    GraftExpr.column(graft.plans.VecDotHalf(
      GraftExpr.expression(a), GraftExpr.expression(b), bf16 = false))

  def dotPackedBf16(a: Column, b: Column): Column =
    GraftExpr.column(graft.plans.VecDotHalf(
      GraftExpr.expression(a), GraftExpr.expression(b), bf16 = true))

  /** int8 packed storage: 1 byte/element (quarter the fp32 bytes),
    * round-half-even x·scale clamped to [-128,127] — same value grid as
    * [[int8Storage]], dequantized in DOUBLE by the packed kernels. */
  def packInt8(v: Column, scale: Double): Column =
    GraftExpr.column(graft.plans.VecPackInt8(GraftExpr.expression(v), scale))

  def unpackInt8(v: Column, scale: Double): Column =
    GraftExpr.column(graft.plans.VecUnpackInt8(GraftExpr.expression(v), scale))

  def l2SqPackedInt8(a: Column, b: Column, scale: Double): Column =
    GraftExpr.column(graft.plans.VecL2SqInt8(
      GraftExpr.expression(a), GraftExpr.expression(b), scale))

  def dotPackedInt8(a: Column, b: Column, scale: Double): Column =
    GraftExpr.column(graft.plans.VecDotInt8(
      GraftExpr.expression(a), GraftExpr.expression(b), scale))

  /** int8 storage: round-half-even to the 1/scale grid, clamped to the
    * int8 range; dequantized for compute (`operands.h` int8 + fp32 mock). */
  def int8Storage(v: Column, scale: Double): Column =
    transform(v, x =>
      greatest(lit(-128.0d), least(lit(127.0d), bround(x.cast("double") * scale))) / scale)

  // ----- binary (sign-bit) vectors ------------------------------------------
  // Reference bin1 vectors pack 8 dims/byte (operands.h:48-147); we derive a
  // binary view of a float vector by its sign bits, packed 32 dims per BIGINT
  // word (no 1<<63 sign-overflow issues, safe in both Spark and DuckDB).

  /** Pack sign bits (elem > 0) into `ceil(dim/32)` BIGINT words. */
  def signBits(v: Column): Column =
    transform(
      sequence(lit(0), floor((size(v) + 31) / 32).cast("int") - 1),
      w =>
        aggregate(
          sequence(lit(0), lit(31)),
          lit(0L),
          (acc, j) =>
            acc + when(
              w * 32 + j < size(v) && element_at(v, (w * 32 + j + 1).cast("int")) > 0,
              pow(lit(2.0d), j).cast("long") // exact for j ≤ 31
            ).otherwise(lit(0L))
        )
    )

  private def popcount(words: Column): Column =
    aggregate(words, lit(0), (acc, w) => acc + bit_count(w))

  /** Hamming distance between two packed signatures
    * (reference HAMMING metric, `brute_force.cc:212-236`). */
  def hamming(a: Column, b: Column): Column =
    popcount(zip_with(a, b, (x, y) => x.bitwiseXOR(y)))

  /** Jaccard distance 1 - |and|/|or| (reference JACCARD). */
  def jaccardDist(a: Column, b: Column): Column = {
    val inter = popcount(zip_with(a, b, (x, y) => x.bitwiseAND(y)))
    val uni = popcount(zip_with(a, b, (x, y) => x.bitwiseOR(y)))
    when(uni === 0, lit(0.0d)).otherwise(lit(1.0d) - inter.cast("double") / uni.cast("double"))
  }

  /** Substructure containment: every bit of a ⊆ b (reference
    * SUBSTRUCTURE metric via binary_knn_mc, `brute_force.cc:229-236`). */
  def substructure(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => when(x.bitwiseAND(y) === x, lit(0)).otherwise(lit(1))),
      lit(0), (acc, x) => acc + x) === 0

  /** Superstructure containment: every bit of b ⊆ a. */
  def superstructure(a: Column, b: Column): Column = substructure(b, a)

  // ----- sparse vectors -----------------------------------------------------
  // SparseRow = (indices sorted asc, values) pairs (sparse_utils.h:96-254).
  // The reference dot is a sorted merge-join (sparse_utils.h:203-225); the
  // relational equivalent is explode → join on dim → sum, implemented in
  // operators.SparseSearch. Here: a direct two-array kernel for small rows.

  /** Sparse dot product over (indices, values) arrays via map lookup. */
  def sparseDot(aIdx: Column, aVal: Column, bIdx: Column, bVal: Column): Column = {
    val bMap = map_from_arrays(bIdx, bVal)
    aggregate(
      zip_with(aIdx, aVal, (i, v) => coalesce(element_at(bMap, i), lit(0.0f)).cast("double") * v.cast("double")),
      lit(0.0d),
      (acc, x) => acc + x
    )
  }

  /** BM25 term weight tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl))
    * (reference `sparse_utils.h:62-66`). */
  def bm25TermWeight(tf: Column, docLen: Column, k1: Double, b: Double, avgdl: Double): Column =
    tf.cast("double") * (k1 + 1.0) /
      (tf.cast("double") + lit(k1) * (lit(1.0 - b) + lit(b / avgdl) * docLen.cast("double")))
}
