package graft.plans

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftExpr
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** HyperLogLog registers: m = 256 one-byte registers (p = 8), rho capped at
  * 32 so every `2^-M_j` term is an exact DECIMAL(38,35) — the whole sketch
  * is a max-merge, so the result is independent of row order, partitioning,
  * and merge tree shape (the property that lets the estimate sit under the
  * driver's exact hash gate).
  */
final class HllSketch extends Serializable {
  import HllSketch._

  val registers = new Array[Byte](M)

  def add(utf8: Array[Byte]): Unit = {
    val d = digestLocal.get().digest(utf8)
    val bucket = d(0) & 0xff
    // rho = leading zero bits of the remaining 120 bits, + 1, capped at 32
    var z = 0
    var i = 1
    var done = false
    while (!done && i < d.length) {
      val b = d(i) & 0xff
      if (b == 0) { z += 8; i += 1 }
      else { z += Integer.numberOfLeadingZeros(b) - 24; done = true }
    }
    val rho = math.min(z + 1, RhoCap).toByte
    if (rho > registers(bucket)) registers(bucket) = rho
  }

  def merge(other: HllSketch): Unit = {
    var i = 0
    while (i < M) {
      if (other.registers(i) > registers(i)) registers(i) = other.registers(i)
      i += 1
    }
  }

  /** The estimate, mirroring the DuckDB oracle formula operation-for-
    * operation: Z summed exactly in decimal (each term a dyadic rational
    * with ≤ 32 fraction digits), then one nearest-double conversion; the
    * raw Flajolet estimate with the standard small-range linear-counting
    * correction below 2.5m. Only the final `ln` and the decimal→double
    * conversion are inexact — both are ≤ 1 ulp from the oracle's, which a
    * caller-side round(·, 4) absorbs.
    */
  def estimate: Double = {
    var v0 = 0
    var zSum = java.math.BigDecimal.ZERO
    var i = 0
    while (i < M) {
      val r = registers(i) & 0xff
      if (r == 0) v0 += 1
      else zSum = zSum.add(java.math.BigDecimal.ONE.divide(new java.math.BigDecimal(1L << r)))
      i += 1
    }
    val zd = zSum.doubleValue()
    val raw = 0.7213 / (1 + 1.079 / 256.0) * 65536.0 / (zd + v0)
    if (raw <= 2.5 * M && v0 > 0) M * math.log(M.toDouble / v0) else raw
  }
}

object HllSketch {
  val M = 256 // p = 8: bucket = first md5 byte
  val RhoCap = 32 // keeps 2^-rho within DECIMAL(38,35) in the oracle

  private val digestLocal = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  def deserialize(bytes: Array[Byte]): HllSketch = {
    val s = new HllSketch
    System.arraycopy(bytes, 0, s.registers, 0, M)
    s
  }
}

/** Approximate distinct count as a mergeable HLL sketch — the map-side
  * partial shuffles ONE 256-byte buffer per (group, partition) instead of
  * the two-phase exact-distinct's deduped key set. At 100 TB this is the
  * difference between a shuffle proportional to the distinct-key count and
  * one proportional to groups × partitions.
  *
  * Hash = md5 of the child string's UTF-8 bytes, so the identical register
  * table — and therefore the identical estimate — is expressible in the
  * DuckDB oracle over `md5(CAST(x AS VARCHAR))` hex output.
  */
case class HllAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[HllSketch] {

  override def prettyName: String = "hll_distinct"
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = DoubleType

  override def createAggregationBuffer(): HllSketch = new HllSketch

  override def update(buffer: HllSketch, input: InternalRow): HllSketch = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[UTF8String].getBytes)
    buffer
  }

  override def merge(buffer: HllSketch, other: HllSketch): HllSketch = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: HllSketch): Any = buffer.estimate

  override def serialize(buffer: HllSketch): Array[Byte] = buffer.registers

  override def deserialize(storageFormat: Array[Byte]): HllSketch =
    HllSketch.deserialize(storageFormat)

  override def withNewMutableAggBufferOffset(newOffset: Int): HllAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
}

object HllAgg {

  /** `hllDistinct(col)`: the sketch estimate as an aggregate Column; `col`
    * is cast to string so Spark and the oracle hash identical bytes. */
  def hllDistinct(c: Column): Column =
    GraftExpr.column(HllAgg(GraftExpr.expression(c.cast("string"))).toAggregateExpression())
}
