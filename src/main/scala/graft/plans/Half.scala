package graft.plans

import org.apache.spark.sql.catalyst.util.ArrayData

/** True half-width element storage — IEEE binary16 ("fp16") and bfloat16
  * bit conversions plus whole-array kernels over 2-byte-packed buffers.
  *
  * The reference's fp16/bf16 element types (`include/knowhere/operands.h:
  * 48-147`) are real 2-byte STORAGE formats whose compute path widens to
  * fp32 (`operands.h:180-198` mocking). The repo's earlier rendering kept
  * only the value grid (VectorFunctions.fp16Storage) on 4-byte floats —
  * correct values, 2× the bytes. This is the storage half: vectors pack to
  * `dim*2`-byte BINARY columns and the distance kernels decode inline, so
  * at 100 TB the scan payload actually halves.
  *
  * Conversions are round-to-nearest-even (the IEEE default the reference
  * inherits from hardware converts). All binary16/bfloat16 values are
  * exactly representable in fp32, so decode is exact and the packed
  * kernels reproduce the value-grid kernels bit for bit — which is what
  * keeps the packed queries under the same DuckDB oracle as the grid ones.
  *
  * Static methods (Scala object ⇒ static forwarders) so whole-stage
  * codegen can call them from generated Java.
  */
object Half {

  private val TwoM24: Float = java.lang.Float.intBitsToFloat(0x33800000) // 2^-24

  /** fp32 → binary16 bits, round-to-nearest-even. */
  def floatToHalf(f: Float): Short = {
    val bits = java.lang.Float.floatToRawIntBits(f)
    val sign = (bits >>> 16) & 0x8000
    val absBits = bits & 0x7fffffff
    if (absBits >= 0x7f800000) // NaN / Inf
      return (sign | (if (absBits > 0x7f800000) 0x7e00 else 0x7c00)).toShort
    // |x| ≥ 65520 = binary16 max + ½ulp rounds to infinity (tie → even = inf)
    if (absBits >= 0x477ff000) return (sign | 0x7c00).toShort
    // |x| ≤ 2^-25 rounds to zero (tie at 2^-25 → even = 0)
    if (absBits <= 0x33000000) return sign.toShort
    val exp = absBits >>> 23 // biased fp32 exponent (≥ 102 here)
    val mant = (absBits & 0x7fffff) | 0x800000 // 24-bit significand
    val he = exp - 112 // biased binary16 exponent
    val shift = if (he >= 1) 13 else 14 - he // ≤ 24 (he ≥ -10 here)
    val sig = mant >>> shift
    val lsb = sig & 1
    val roundBit = (mant >>> (shift - 1)) & 1
    val sticky = mant & ((1 << (shift - 1)) - 1)
    var half = if (he >= 1) (he << 10) | (sig & 0x3ff) else sig
    // RNE increment; a mantissa carry walks into the exponent field —
    // correct for subnormal→normal and binade-up (incl. 65504 → inf)
    if (roundBit == 1 && (lsb == 1 || sticky != 0)) half += 1
    (sign | half).toShort
  }

  /** binary16 bits → fp32 (exact). */
  def halfToFloat(h: Short): Float = {
    val hb = h & 0xffff
    val sign = (hb & 0x8000) << 16
    val exp = (hb >>> 10) & 0x1f
    val mant = hb & 0x3ff
    if (exp == 0x1f)
      java.lang.Float.intBitsToFloat(sign | 0x7f800000 | (mant << 13))
    else if (exp != 0)
      java.lang.Float.intBitsToFloat(sign | ((exp + 112) << 23) | (mant << 13))
    else if (mant == 0) java.lang.Float.intBitsToFloat(sign)
    else {
      val v = mant.toFloat * TwoM24 // exact: small int × power of two
      if ((hb & 0x8000) != 0) -v else v
    }
  }

  /** fp32 → bfloat16 bits, round-to-nearest-even (truncate top 16 bits
    * with RNE carry; same exponent range as fp32). */
  def floatToBf16(f: Float): Short = {
    val bits = java.lang.Float.floatToRawIntBits(f)
    if ((bits & 0x7fffffff) > 0x7f800000) // NaN: quieten, keep top payload
      return ((bits >>> 16) | 0x0040).toShort
    val lsb = (bits >>> 16) & 1
    ((bits + 0x7fff + lsb) >>> 16).toShort
  }

  /** bfloat16 bits → fp32 (exact). */
  def bf16ToFloat(h: Short): Float =
    java.lang.Float.intBitsToFloat((h & 0xffff) << 16)

  // ----- packed-buffer layout: little-endian 2 bytes per element ----------

  @inline private def readBits(bytes: Array[Byte], i: Int): Short =
    (((bytes(2 * i + 1) & 0xff) << 8) | (bytes(2 * i) & 0xff)).toShort

  @inline private def writeBits(bytes: Array[Byte], i: Int, v: Short): Unit = {
    bytes(2 * i) = v.toByte
    bytes(2 * i + 1) = (v >>> 8).toByte
  }

  @inline private def decode(bytes: Array[Byte], i: Int, bf16: Boolean): Float =
    if (bf16) bf16ToFloat(readBits(bytes, i)) else halfToFloat(readBits(bytes, i))

  /** Pack a numeric ArrayData into a 2-byte-per-element buffer.
    * `fromDouble` selects the source accessor (ArrayType(FloatType) vs
    * ArrayType(DoubleType)); doubles narrow through fp32 first — two
    * correctly-rounded steps, matching how fp32-sourced data reaches the
    * half formats everywhere. */
  def pack(ad: ArrayData, fromDouble: Boolean, bf16: Boolean): Array[Byte] = {
    val n = ad.numElements()
    val out = new Array[Byte](2 * n)
    var i = 0
    while (i < n) {
      val f = if (fromDouble) ad.getDouble(i).toFloat else ad.getFloat(i)
      writeBits(out, i, if (bf16) floatToBf16(f) else floatToHalf(f))
      i += 1
    }
    out
  }

  /** Unpack to fp32 (exact decode). */
  def unpack(bytes: Array[Byte], bf16: Boolean): Array[Float] = {
    val n = bytes.length / 2
    val out = new Array[Float](n)
    var i = 0
    while (i < n) {
      out(i) = decode(bytes, i, bf16)
      i += 1
    }
    out
  }

  /** Σ (a_i − b_i)² over packed buffers — decode inline, accumulate in
    * DOUBLE left-to-right (the repo-wide determinism contract; identical
    * to VecL2Sq over the unpacked arrays). */
  def l2Sq(a: Array[Byte], b: Array[Byte], bf16: Boolean): Double = {
    val n = math.min(a.length, b.length) / 2
    var s = 0.0d
    var i = 0
    while (i < n) {
      val d = decode(a, i, bf16).toDouble - decode(b, i, bf16).toDouble
      s += d * d
      i += 1
    }
    s
  }

  /** Σ a_i·b_i over packed buffers. */
  def dot(a: Array[Byte], b: Array[Byte], bf16: Boolean): Double = {
    val n = math.min(a.length, b.length) / 2
    var s = 0.0d
    var i = 0
    while (i < n) {
      s += decode(a, i, bf16).toDouble * decode(b, i, bf16).toDouble
      i += 1
    }
    s
  }

  // ----- int8 packed storage: 1 byte per element ----------------------------
  // The reference's third reduced element type (`operands.h:48-147` int8;
  // compute mocks through fp32 like the half types). Quantization contract
  // matches the value-grid rendering (VectorFunctions.int8Storage and the
  // oracle's roundbankers SQL): round-half-even of x·scale, clamped to
  // [-128, 127]; decode divides back in DOUBLE.

  /** Pack to 1 byte/element: clamp(rint(x·scale)). Math.rint is
    * round-half-even on the binary double — the roundbankers analog. */
  def packInt8(ad: ArrayData, fromDouble: Boolean, scale: Double): Array[Byte] = {
    val n = ad.numElements()
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      val x = if (fromDouble) ad.getDouble(i) else ad.getFloat(i).toDouble
      val q = math.rint(x * scale)
      out(i) = math.max(-128.0, math.min(127.0, q)).toByte
      i += 1
    }
    out
  }

  /** Unpack to the dequantized DOUBLE grid values (byte / scale) — the
    * exact values the grid rendering computes with. */
  def unpackInt8(bytes: Array[Byte], scale: Double): Array[Double] = {
    val n = bytes.length
    val out = new Array[Double](n)
    var i = 0
    while (i < n) {
      out(i) = bytes(i).toDouble / scale
      i += 1
    }
    out
  }

  /** Unpack to FLOAT grid values — the serving packed-int8 tier's decode:
    * byte/scale computed in DOUBLE then correctly rounded to float,
    * identical to Spark's `unpackInt8(...).cast("array<float>")`, so a
    * packed-int8 serving walk is bit-identical to a float searcher loaded
    * from that decoded frame (the fp32-compute contract, operands.h). */
  def unpackInt8ToFloat(bytes: Array[Byte], scale: Double): Array[Float] = {
    val n = bytes.length
    val out = new Array[Float](n)
    var i = 0
    while (i < n) {
      out(i) = (bytes(i).toDouble / scale).toFloat
      i += 1
    }
    out
  }

  /** Σ (a_i − b_i)² over int8 buffers, dequantized in DOUBLE inline. */
  def l2SqInt8(a: Array[Byte], b: Array[Byte], scale: Double): Double = {
    val n = math.min(a.length, b.length)
    var s = 0.0d
    var i = 0
    while (i < n) {
      val d = a(i).toDouble / scale - b(i).toDouble / scale
      s += d * d
      i += 1
    }
    s
  }

  /** Σ a_i·b_i over int8 buffers. */
  def dotInt8(a: Array[Byte], b: Array[Byte], scale: Double): Double = {
    val n = math.min(a.length, b.length)
    var s = 0.0d
    var i = 0
    while (i < n) {
      s += (a(i).toDouble / scale) * (b(i).toDouble / scale)
      i += 1
    }
    s
  }
}
