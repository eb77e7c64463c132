package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions
import graft.operators.TextAnalysis.{shingles, tokenHash, tokens, HashP}

/** Near-duplicate detection for the training-data pipeline: MinHash+LSH,
  * SimHash, n-gram Jaccard, and embedding-cosine — each as a composition of
  * codegen'd array expressions (per-row signature computation, no shuffle)
  * plus one equi-join on the blocking key (the only shuffle) and an exact
  * verify stage on the candidate pairs.
  *
  * At 100 TB: signatures are map-side arithmetic over each row; the LSH
  * band join shuffles only (id, band-key) pairs, never the text; exact
  * verification touches only the candidate pairs (≪ n²).
  */
object Dedup {

  val NumPerm = 16
  val Bands = 4 // 4 bands × 4 rows
  val RowsPerBand = NumPerm / Bands

  /** Universal-hash permutation i of a shingle hash: ((2i+3)·x + 97+31i) mod P. */
  private def perm(i: Column, x: Column): Column =
    ((lit(2L) * i + 3L) * x + (lit(97L) + lit(31L) * i)) % HashP

  /** Distinct token-3-gram shingle hashes per doc. */
  def shingleHashes(text: Column, n: Int = 3): Column =
    array_distinct(transform(shingles(tokens(text), n), tokenHash(_)))

  /** MinHash signature: sig[i] = min over shingles of perm_i(shingleHash).
    * Pure per-row array arithmetic — the Train phase of dedup. */
  def minhashSignature(text: Column, numPerm: Int = NumPerm): Column = {
    val sh = shingleHashes(text)
    transform(
      sequence(lit(0L), lit(numPerm - 1L)),
      i => array_min(transform(sh, x => perm(i, x)))
    )
  }

  /** Band key: fold of the band's signature slice, (h·31+x) mod P. */
  def bandHash(sig: Column, band: Int, rowsPerBand: Int = RowsPerBand): Column =
    aggregate(
      slice(sig, band * rowsPerBand + 1, rowsPerBand),
      lit(0L),
      (h, x) => (h * 31L + x) % HashP
    )

  /** Candidate pairs sharing any LSH band, then exact-Jaccard verified.
    * Output: (doc_a, doc_b, jaccard) with doc_a < doc_b, jaccard ≥ threshold.
    */
  def minhashLshPairs(
      docs: DataFrame, // (doc_id, text)
      threshold: Double,
      numPerm: Int = NumPerm,
      bands: Int = Bands
  ): DataFrame = {
    val withSig = docs.select(
      col("doc_id"),
      shingleHashes(col("text")).as("sh"),
      minhashSignature(col("text"), numPerm).as("sig"))
    val bandCols = (0 until bands).map(b =>
      struct(lit(b).as("band"), bandHash(col("sig"), b).as("bh")))
    val banded2 = withSig
      .select(col("doc_id"), col("sh"), explode(array(bandCols: _*)).as("x"))
      .select(col("doc_id"), col("sh"), col("x.band").as("band"), col("x.bh").as("bh"))
    val a = banded2.select(col("doc_id").as("doc_a"), col("sh").as("sha"), col("band"), col("bh"))
    val b = banded2.select(col("doc_id").as("doc_b"), col("sh").as("shb"), col("band"), col("bh"))
    val pairs = a
      .join(b, Seq("band", "bh"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("sha"), col("shb"))
      .dropDuplicates("doc_a", "doc_b")
    val inter = size(array_intersect(col("sha"), col("shb"))).cast("double")
    val jac = inter / (size(col("sha")) + size(col("shb")) - inter).cast("double")
    pairs
      .select(col("doc_a"), col("doc_b"), round(jac, 4).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** n-gram Jaccard near-dup with 1-permutation min-hash blocking: block on
    * the global minimum shingle hash (cheap, catches near-dups whose edit
    * doesn't remove the min shingle), verify exact Jaccard. */
  def ngramJaccardPairs(docs: DataFrame, threshold: Double): DataFrame = {
    val withMin = docs.select(
      col("doc_id"),
      shingleHashes(col("text")).as("sh"),
      array_min(shingleHashes(col("text"))).as("blk"))
    val a = withMin.select(col("doc_id").as("doc_a"), col("sh").as("sha"), col("blk"))
    val b = withMin.select(col("doc_id").as("doc_b"), col("sh").as("shb"), col("blk"))
    val pairs = a.join(b, "blk").filter(col("doc_a") < col("doc_b"))
    val inter = size(array_intersect(col("sha"), col("shb"))).cast("double")
    val jac = inter / (size(col("sha")) + size(col("shb")) - inter).cast("double")
    pairs
      .select(col("doc_a"), col("doc_b"), round(jac, 4).as("jaccard"))
      .filter(col("jaccard") >= threshold)
      .dropDuplicates("doc_a", "doc_b")
  }

  /** 32-bit SimHash over distinct shingle hashes: bit b set iff
    * Σ_sh (±1 by bit b of sh) > 0. Shingle features (not tokens) so small
    * vocabularies still produce near-uniform signatures for unrelated docs.
    * Takes a precomputed distinct-shingle-hash array column. */
  def simhash(shingleHashCol: Column): Column =
    aggregate(
      sequence(lit(0), lit(31)),
      lit(0L),
      (acc, bcol) => {
        val wsum = aggregate(
          shingleHashCol,
          lit(0L),
          (a2, sh) => {
            val bit = floor(sh.cast("double") / pow(lit(2.0d), bcol)).cast("long") % 2L
            a2 + when(bit === 1L, 1L).otherwise(-1L)
          }
        )
        acc + when(wsum > 0L, pow(lit(2.0d), bcol).cast("long")).otherwise(0L)
      }
    )

  /** SimHash near-dup pairs: block on any equal 8-bit byte of the
    * signature, keep pairs with bit-hamming ≤ maxHamming. */
  def simhashPairs(docs: DataFrame, maxHamming: Int): DataFrame = {
    val withSig = docs
      .select(col("doc_id"), shingleHashes(col("text")).as("sh"))
      .select(col("doc_id"), simhash(col("sh")).as("sig"))
    val byteCols = (0 until 4).map(i =>
      struct(lit(i).as("b"), (shiftright(col("sig"), i * 8).bitwiseAND(255L)).as("bv")))
    val banded = withSig
      .select(col("doc_id"), col("sig"), explode(array(byteCols: _*)).as("x"))
      .select(col("doc_id"), col("sig"), col("x.b").as("b"), col("x.bv").as("bv"))
    val a = banded.select(col("doc_id").as("doc_a"), col("sig").as("siga"), col("b"), col("bv"))
    val bb = banded.select(col("doc_id").as("doc_b"), col("sig").as("sigb"), col("b"), col("bv"))
    a.join(bb, Seq("b", "bv"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        bit_count(col("siga").bitwiseXOR(col("sigb"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .dropDuplicates("doc_a", "doc_b")
  }

  /** Embedding-cosine nearest neighbor per vector (near-dup scan over an
    * embedding column): top-1 excluding self. */
  def cosineTop1(embeddings: DataFrame, roundDist: Option[Int] = Some(4)): DataFrame = {
    val q = embeddings.select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val b = embeddings.select(col("vec_id").as("id"), col("embedding").as("vec"))
    val pairs = BruteForce
      .pairs(q, b, Metric.Cosine, baseFilter = None, roundDist = roundDist)
      .filter(col("qid") =!= col("nid")) // exclude self BEFORE ranking
    BruteForce
      .topK(pairs, 1, ascending = false)
      .select(col("qid"), col("nid"), col("dist"))
  }
}
