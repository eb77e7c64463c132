package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftExpr
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Bloom filter over LONG keys: `numBits = 2^log2Bits` bits, `k` probes per
  * key by double hashing (two splitmix64-finalized mixes of the key; probe
  * j tests bit `h1 + j·h2`). Pure long arithmetic, no data-dependent
  * branching — the filter built from a key set is a deterministic function
  * of the SET (bit-OR merge is commutative/associative/idempotent), never
  * of row order or partitioning.
  *
  * Role at 100 TB: a membership PRE-FILTER. The bits broadcast at ~1/50th
  * the footprint of a hash-relation over the same keys, prune the big side
  * MAP-SIDE before any exchange, and an exact confirm-join afterwards
  * removes the false positives — so the output stays exact while the
  * shuffle carries only `matches + ε·N` rows instead of N.
  */
final class LongBloom(val bits: Array[Long], val k: Int) extends Serializable {
  def numBits: Int = bits.length * 64

  def add(x: Long): Unit = {
    val h1 = LongBloom.mix(x)
    val h2 = LongBloom.mix(x + 0x9e3779b97f4a7c15L) | 1L
    var j = 0
    while (j < k) {
      val bit = java.lang.Long.remainderUnsigned(h1 + j * h2, numBits.toLong).toInt
      bits(bit >>> 6) |= 1L << (bit & 63)
      j += 1
    }
  }

  def merge(other: LongBloom): Unit = {
    var i = 0
    while (i < bits.length) { bits(i) |= other.bits(i); i += 1 }
  }

  def mightContain(x: Long): Boolean = LongBloom.contains(bits, k, x)

  def serialize: Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(bits.length * 8)
    bb.asLongBuffer().put(bits)
    bb.array()
  }
}

object LongBloom {
  /** splitmix64 finalizer — the standard 64-bit avalanche mix. */
  def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Called from generated code. */
  def contains(bits: Array[Long], k: Int, x: Long): Boolean = {
    val numBits = bits.length * 64L
    val h1 = mix(x)
    val h2 = mix(x + 0x9e3779b97f4a7c15L) | 1L
    var j = 0
    while (j < k) {
      val bit = java.lang.Long.remainderUnsigned(h1 + j * h2, numBits).toInt
      if ((bits(bit >>> 6) & (1L << (bit & 63))) == 0L) return false
      j += 1
    }
    true
  }

  def empty(log2Bits: Int, k: Int): LongBloom = {
    require(log2Bits >= 6 && log2Bits <= 34, s"log2Bits out of range: $log2Bits")
    require(k >= 1 && k <= 16, s"k out of range: $k")
    new LongBloom(new Array[Long](1 << (log2Bits - 6)), k)
  }

  def deserialize(bytes: Array[Byte], k: Int): LongBloom = {
    val bits = new Array[Long](bytes.length / 8)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(bits)
    new LongBloom(bits, k)
  }
}

/** Distributed bloom BUILD as a mergeable aggregate (same
  * TypedImperativeAggregate shape as [[HllAgg]]/[[CountMinAgg]]): each
  * partition sets bits locally, partials OR-merge — one `2^log2Bits`-bit
  * buffer per partition moves instead of the key set. Returns the
  * serialized bits (BINARY). */
case class BloomAgg(
    child: Expression,
    log2Bits: Int,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[LongBloom] {

  override def prettyName: String = "bloom_build"
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): LongBloom = LongBloom.empty(log2Bits, k)

  override def update(buffer: LongBloom, input: InternalRow): LongBloom = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: LongBloom, other: LongBloom): LongBloom = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: LongBloom): Any = buffer.serialize

  override def serialize(buffer: LongBloom): Array[Byte] = buffer.serialize

  override def deserialize(storageFormat: Array[Byte]): LongBloom =
    LongBloom.deserialize(storageFormat, k)

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
}

/** `bloom_might_contain(x)` with the bits pinned at plan time — a codegen'd
  * scalar probe (two mixes + k bit tests inline in whole-stage codegen; the
  * bit array rides the plan as a reference object, the executor-side
  * broadcast every task shares). */
case class LongBloomMightContain(child: Expression, bits: Array[Long], k: Int)
    extends UnaryExpression {

  override def prettyName: String = "bloom_might_contain"
  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires BIGINT, got ${child.dataType}")

  override def nullSafeEval(v: Any): Any =
    LongBloom.contains(bits, k, v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bitsRef = ctx.addReferenceObj("bloomBits", bits, "long[]")
    defineCodeGen(ctx, ev, c => s"graft.plans.LongBloom.contains($bitsRef, $k, $c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BloomAgg {

  /** Aggregate Column building the serialized bloom over a LONG key column. */
  def bloomBuild(c: Column, log2Bits: Int, k: Int): Column =
    GraftExpr.column(
      BloomAgg(GraftExpr.expression(c), log2Bits, k).toAggregateExpression())

  /** Filter Column testing a LONG key against prebuilt bits. */
  def bloomMightContain(c: Column, bloom: LongBloom): Column =
    GraftExpr.column(LongBloomMightContain(GraftExpr.expression(c), bloom.bits, bloom.k))
}
