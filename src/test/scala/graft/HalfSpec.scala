package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._
import graft.operators.{BruteForce, Capabilities, Metric}
import graft.plans.Half
import graft.sources.Tables

/** True half-width packed storage (graft.plans.Half — the 2-byte storage
  * half of `include/knowhere/operands.h:48-147`): IEEE RNE conversion
  * boundary cases, element-exact agreement with the value-grid rendering
  * (fp16Storage/bf16Storage — the oracle's formulation), and packed-kernel
  * bit-identity with the unpacked kernels.
  */
class HalfSpec extends SparkSpec {

  // ---- binary16 conversion: known bit patterns --------------------------

  test("fp16 bit patterns: exact values, max, subnormals, signed zero") {
    assert(Half.floatToHalf(0.0f) == 0x0000.toShort)
    assert(Half.floatToHalf(-0.0f) == 0x8000.toShort)
    assert(Half.floatToHalf(1.0f) == 0x3c00.toShort)
    assert(Half.floatToHalf(-2.0f) == 0xc000.toShort)
    assert(Half.floatToHalf(65504.0f) == 0x7bff.toShort) // binary16 max
    assert(Half.floatToHalf(Float.PositiveInfinity) == 0x7c00.toShort)
    // overflow: max + ½ulp = 65520 ties to even (infinity); below stays max
    assert(Half.floatToHalf(65520.0f) == 0x7c00.toShort)
    assert(Half.floatToHalf(65519.996f) == 0x7bff.toShort)
    // smallest subnormal 2^-24; the 2^-25 tie goes to even (zero)
    assert(Half.floatToHalf(5.9604645e-8f) == 0x0001.toShort)
    assert(Half.floatToHalf(2.9802322e-8f) == 0x0000.toShort)
    assert(Half.floatToHalf(4.4703484e-8f) == 0x0001.toShort) // 1.5·2^-25 → nearest
    // min normal 2^-14
    assert(Half.floatToHalf(6.1035156e-5f) == 0x0400.toShort)
  }

  test("fp16 round-to-nearest-even at the mantissa boundary") {
    // 1 + 2^-11 ties between 1.0 (even) and 1 + 2^-10 (odd) → 1.0
    assert(Half.halfToFloat(Half.floatToHalf(1.0f + math.pow(2, -11).toFloat)) == 1.0f)
    // 1 + 3·2^-11 ties between 1+2^-10 (odd) and 1+2^-9 (even) → 1+2^-9
    assert(Half.halfToFloat(Half.floatToHalf(1.0f + 3 * math.pow(2, -11).toFloat))
      == 1.0f + math.pow(2, -9).toFloat)
    // just above the tie rounds up
    assert(Half.halfToFloat(Half.floatToHalf(1.0f + 1.1f * math.pow(2, -11).toFloat))
      == 1.0f + math.pow(2, -10).toFloat)
  }

  test("fp16/bf16 round-trip is idempotent on representable values") {
    val vals = Seq(0.25f, -1.5f, 3.14159f, 1e-3f, -7.77f, 123.456f, 1e-6f, -4.2e-5f)
    for (v <- vals) {
      val h = Half.halfToFloat(Half.floatToHalf(v))
      assert(Half.halfToFloat(Half.floatToHalf(h)) == h)
      val b = Half.bf16ToFloat(Half.floatToBf16(v))
      assert(Half.bf16ToFloat(Half.floatToBf16(b)) == b)
    }
  }

  test("bf16: truncation-with-RNE against exact powers and ties") {
    assert(Half.floatToBf16(1.0f) == 0x3f80.toShort)
    assert(Half.bf16ToFloat(Half.floatToBf16(1.0f)) == 1.0f)
    // 1 + 2^-8 ties between 1.0 (even) and 1 + 2^-7 (odd) → 1.0
    assert(Half.bf16ToFloat(Half.floatToBf16(1.0f + math.pow(2, -8).toFloat)) == 1.0f)
    // 1 + 3·2^-8 → 1 + 2^-6 (even mantissa wins the tie)
    assert(Half.bf16ToFloat(Half.floatToBf16(1.0f + 3 * math.pow(2, -8).toFloat))
      == 1.0f + math.pow(2, -6).toFloat)
  }

  // ---- agreement with the value-grid rendering (the oracle's form) ------

  private lazy val emb = Tables.embeddings(spark, sf0001)

  test("pack→unpack equals fp16Storage element-for-element on real data") {
    val bad = emb
      .select(
        unpackFp16(packFp16(col("embedding"))).as("packed"),
        fp16Storage(col("embedding")).as("grid"))
      .select(explode(zip_with(col("packed"), col("grid"),
        (p, g) => (p.cast("double") =!= g.cast("double")).cast("int"))).as("ne"))
      .agg(sum("ne")).head().getLong(0)
    assert(bad == 0L)
  }

  test("pack→unpack equals bf16Storage element-for-element on real data") {
    val bad = emb
      .select(
        unpackBf16(packBf16(col("embedding"))).as("packed"),
        bf16Storage(col("embedding")).as("grid"))
      .select(explode(zip_with(col("packed"), col("grid"),
        (p, g) => (p.cast("double") =!= g.cast("double")).cast("int"))).as("ne"))
      .agg(sum("ne")).head().getLong(0)
    assert(bad == 0L)
  }

  test("packed binary is exactly 2 bytes per element") {
    val row = emb
      .select(size(col("embedding")).as("dim"), length(packFp16(col("embedding"))).as("len"))
      .filter(col("len") =!= col("dim") * 2)
    assert(row.count() == 0)
  }

  // ---- packed kernels ≡ unpacked kernels --------------------------------

  test("packed L2/IP kernels are bit-identical to the array kernels") {
    val q = emb.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("qid"),
        packFp16(col("embedding")).as("pq"),
        fp16Storage(col("embedding")).as("aq"))
    val b = emb.limit(200)
      .select(col("vec_id").as("id"),
        packFp16(col("embedding")).as("pb"),
        fp16Storage(col("embedding")).as("ab"))
    val bad = q.crossJoin(b)
      .select(
        (l2SqPackedFp16(col("pq"), col("pb")) =!= l2Sq(col("aq"), col("ab"))).cast("int").as("n1"),
        (dotPackedFp16(col("pq"), col("pb")) =!= dot(col("aq"), col("ab"))).cast("int").as("n2"))
      .agg(sum("n1") + sum("n2")).head().getLong(0)
    assert(bad == 0L)
  }

  test("int8 pack→unpack equals int8Storage element-for-element on real data") {
    val bad = emb
      .select(
        unpackInt8(packInt8(col("embedding"), 100.0), 100.0).as("packed"),
        int8Storage(col("embedding"), 100.0).as("grid"))
      .select(explode(zip_with(col("packed"), col("grid"),
        (p, g) => (p =!= g).cast("int"))).as("ne"))
      .agg(sum("ne")).head().getLong(0)
    assert(bad == 0L)
  }

  test("int8 packed is 1 byte per element; clamping engages at the rails") {
    val row = emb
      .select(size(col("embedding")).as("dim"), length(packInt8(col("embedding"), 100.0)).as("len"))
      .filter(col("len") =!= col("dim"))
    assert(row.count() == 0)
    // a value past the rail clamps to ±127/-128 on the dequantized grid
    import graft.plans.Half
    val big = Half.packInt8(
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(Array(9.99f, -9.99f)),
      fromDouble = false, scale = 100.0)
    assert(big(0) == 127.toByte && big(1) == (-128).toByte)
  }

  test("knnPackedInt8 matches knn over the int8 grid") {
    val qp = emb.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("qid"), packInt8(col("embedding"), 100.0).as("qvec"))
    val bp = emb.select(col("vec_id").as("id"), packInt8(col("embedding"), 100.0).as("vec"))
    val qa = emb.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("qid"), int8Storage(col("embedding"), 100.0).as("qvec"))
    val ba = emb.select(col("vec_id").as("id"), int8Storage(col("embedding"), 100.0).as("vec"))
    val packed = BruteForce.knnPackedInt8(qp, bp, 10, Metric.L2, 100.0, roundDist = Some(4))
    val grid = BruteForce.knn(qa, ba, 10, Metric.L2, roundDist = Some(4))
    assert(packed.collect().toSet == grid.collect().toSet)
  }

  // ---- factory per-datatype key (IndexFactory::Create<fp16> analog) -----

  test("factory FLAT + fp16 builds 2-byte storage, matches the grid path") {
    val base = emb.select(col("vec_id").as("id"), col("embedding").as("vec"))
    val q = emb.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val packed = IndexFactory.build(spark, "FLAT", base, Metric.L2,
      roundDist = Some(4), elementType = "fp16")
    assert(packed.isInstanceOf[PackedFlatIndex])
    assert(packed.indexMetaJson.contains("\"element_type\":\"fp16\""))
    assert(packed.dim == 64)
    val gridIdx = new FlatIndex(
      base.select(col("id"), fp16Storage(col("vec")).as("vec")), Metric.L2, Some(4))
    val gq = q.select(col("qid"), fp16Storage(col("qvec")).as("qvec"))
    assert(packed.search(q, 10, None).collect().toSet
      == gridIdx.search(gq, 10, None).collect().toSet)
    // save/load roundtrip stays packed and search-identical
    val dir = java.nio.file.Files.createTempDirectory("packedflat").toString
    packed.save(dir)
    val loaded = IndexFactory.loadFlatPacked(spark, dir, Metric.L2, "fp16", Some(4))
    assert(loaded.search(q, 10, None).collect().toSet
      == packed.search(q, 10, None).collect().toSet)
  }

  test("factory IVF_FLAT + fp16 packs the lists, matches the grid IVF") {
    val base = emb.select(col("vec_id").as("id"), col("embedding").as("vec"))
    val q = emb.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("qid"), fp16Storage(col("embedding")).as("qvec"))
    val packed = IndexFactory.build(spark, "IVF_FLAT", base, Metric.L2,
      nlist = 8, nprobe = 8, roundDist = Some(4), elementType = "fp16")
      .asInstanceOf[PackedIvfIndex]
    assert(packed.indexMetaJson.contains("\"element_type\":\"fp16\""))
    // grid twin: same kmeans seed → same centroids → same assignment
    val baseG = base.select(col("id"), fp16Storage(col("vec")).cast("array<float>").as("vec"))
    val c = operators.IvfIndex.trainKMeans(spark, baseG, nlist = 8, seed = 42L)
    val gridIdx = operators.IvfIndex.build(baseG, c, Some(4))
    val grid = operators.IvfIndex.search(q, gridIdx, c, 10, nprobe = 8,
      Metric.L2, Some(4))
    assert(packed.search(q, 10, None).collect().toSet == grid.collect().toSet)
    // save/load roundtrip keeps lists packed and search-identical
    val dir = java.nio.file.Files.createTempDirectory("packedivf").toString
    packed.save(dir)
    val loaded = IndexFactory.loadIvfPacked(spark, dir, Metric.L2, "fp16",
      nprobe = 8, roundDist = Some(4))
    assert(loaded.search(q, 10, None).collect().toSet
      == packed.search(q, 10, None).collect().toSet)
  }

  test("factory element-type validation follows the capability table") {
    val base = emb.select(col("vec_id").as("id"), col("embedding").as("vec"))
    // GPU_CAGRA registers fp32 only (gpu_raft_cagra.cc:163-175)
    intercept[IllegalArgumentException] {
      IndexFactory.build(spark, "GPU_CAGRA", base, Metric.L2, elementType = "fp16")
    }
    // IVF_PQ supports fp16 via the fp32 mock path — no packed handle,
    // but the key is legal
    assert(Capabilities.supportsDataType("IVF_PQ", "fp16"))
  }

  test("knnPacked matches knn over grid-cast arrays (L2 and IP)") {
    val qp = emb.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("qid"), packFp16(col("embedding")).as("qvec"))
    val bp = emb.select(col("vec_id").as("id"), packFp16(col("embedding")).as("vec"))
    val qa = emb.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("qid"), fp16Storage(col("embedding")).as("qvec"))
    val ba = emb.select(col("vec_id").as("id"), fp16Storage(col("embedding")).as("vec"))
    val packed = BruteForce.knnPacked(qp, bp, 10, Metric.L2, bf16 = false, roundDist = Some(4))
    val grid = BruteForce.knn(qa, ba, 10, Metric.L2, roundDist = Some(4))
    assert(packed.collect().toSet == grid.collect().toSet)
    // cosine rides the cached-norms shape on both paths — same results
    val packedCos = BruteForce.knnPacked(qp, bp, 10, Metric.Cosine, bf16 = false, roundDist = Some(4))
    val gridCos = BruteForce.knn(qa, ba, 10, Metric.Cosine, roundDist = Some(4))
    assert(packedCos.collect().toSet == gridCos.collect().toSet)
  }
}
