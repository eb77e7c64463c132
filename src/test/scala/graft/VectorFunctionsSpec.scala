package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** Distance-kernel unit tests vs hand values — the `test_distances.cc`
  * analog. */
class VectorFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column): Any =
    Seq(1).toDF("x").select(c.as("v")).head.get(0)

  private def vec(xs: Float*) = array(xs.map(lit): _*)

  test("l2 distance of 3-4-5 triangle") {
    assert(one(l2(vec(0f, 0f), vec(3f, 4f))) == 5.0)
    assert(one(l2Sq(vec(0f, 0f), vec(3f, 4f))) == 25.0)
  }

  test("inner product and norm") {
    assert(one(dot(vec(1f, 2f, 3f), vec(4f, 5f, 6f))) == 32.0)
    assert(one(normL2(vec(3f, 4f))) == 5.0)
  }

  test("cosine similarity: parallel=1, orthogonal=0") {
    assert(math.abs(one(cosineSim(vec(1f, 2f), vec(2f, 4f))).asInstanceOf[Double] - 1.0) < 1e-12)
    assert(math.abs(one(cosineSim(vec(1f, 0f), vec(0f, 1f))).asInstanceOf[Double]) < 1e-12)
  }

  test("sign-bit packing across word boundary (40 dims)") {
    // dims 0..39: positive at even positions
    val xs = (0 until 40).map(i => if (i % 2 == 0) 1f else -1f)
    val sig = one(signBits(vec(xs: _*))).asInstanceOf[scala.collection.Seq[Long]]
    assert(sig.length == 2)
    // word 0: bits 0,2,..,30 set => 0x55555555
    assert(sig(0) == 0x55555555L)
    // word 1: bits 0,2,4,6 set (dims 32..39)
    assert(sig(1) == 0x55L)
  }

  test("hamming and jaccard over packed signatures") {
    val a = signBits(vec(1f, 1f, -1f, -1f))
    val b = signBits(vec(1f, -1f, 1f, -1f))
    assert(one(hamming(a, b)) == 2)
    // inter = 1 (bit0), union = 3 => 1 - 1/3
    assert(math.abs(one(jaccardDist(a, b)).asInstanceOf[Double] - (1.0 - 1.0 / 3.0)) < 1e-12)
  }

  test("substructure containment") {
    val small = signBits(vec(1f, -1f, 1f, -1f)) // bits {0,2}
    val big = signBits(vec(1f, 1f, 1f, -1f)) // bits {0,1,2}
    assert(one(substructure(small, big)) == true)
    assert(one(substructure(big, small)) == false)
    assert(one(superstructure(big, small)) == true)
  }

  test("sparse dot via sorted index arrays") {
    val d = one(
      sparseDot(
        array(lit(1), lit(5), lit(9)),
        array(lit(2f), lit(3f), lit(4f)),
        array(lit(5), lit(9), lit(20)),
        array(lit(10f), lit(1f), lit(7f))))
    assert(d == 3.0 * 10 + 4.0 * 1) // shared dims 5 and 9
  }

  test("codegen kernels are bit-identical to the interpreted HOF fold") {
    val e = graft.sources.Tables.embeddings(spark, sf0001).limit(200)
    val pairs = e
      .select(col("vec_id").as("a_id"), col("embedding").as("a"))
      .crossJoin(e.select(col("vec_id").as("b_id"), col("embedding").as("b")))
      .filter(col("a_id") % 20 === 0)
    val mism = pairs
      .select(
        (l2Sq(col("a"), col("b")) =!= l2SqHof(col("a"), col("b"))).as("m1"),
        (dot(col("a"), col("b")) =!= dotHof(col("a"), col("b"))).as("m2"))
      .filter(col("m1") || col("m2"))
      .count()
    assert(mism == 0L)
  }

  test("fp16/bf16/int8 storage casts land on the representable grid") {
    import spark.implicits._
    val df = Seq((1L, Seq(0.1f, -0.1f, 3.0e-5f, 0.0f, 1.0f))).toDF("id", "v")
    val fp16 = df.select(fp16Storage(col("v"))).head.getSeq[Double](0)
    // fp16(0.1) = 0.0999755859375 (IEEE 754 half, round-to-nearest-even);
    // 3e-5 < 2^-14 is subnormal: 503 × 2^-24
    assert(fp16(0) == 0.0999755859375)
    assert(fp16(1) == -0.0999755859375)
    assert(fp16(2) == 503.0 / 16777216.0)
    assert(fp16(3) == 0.0 && fp16(4) == 1.0)
    val bf16 = df.select(bf16Storage(col("v"))).head.getSeq[Double](0)
    assert(bf16(0) == 0.10009765625) // bfloat16(0.1), 7 mantissa bits
    assert(bf16(4) == 1.0)
    val i8 = df.select(int8Storage(col("v"), 100.0)).head.getSeq[Double](0)
    assert(i8(0) == 0.1 && i8(2) == 0.0 && i8(4) == 1.0)
    // clamp: 2.0 × 100 = 200 → 127
    val c = Seq((1L, Seq(2.0f))).toDF("id", "v")
      .select(int8Storage(col("v"), 100.0)).head.getSeq[Double](0)
    assert(c(0) == 1.27)
  }

  test("bm25 term weight matches the reference formula") {
    // tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl)), sparse_utils.h:62-66
    val got = one(bm25TermWeight(lit(3), lit(100), 1.2, 0.75, 80.0)).asInstanceOf[Double]
    val expected = 3.0 * 2.2 / (3.0 + 1.2 * (1.0 - 0.75 + (0.75 / 80.0) * 100.0))
    assert(math.abs(got - expected) < 1e-12)
  }
}
