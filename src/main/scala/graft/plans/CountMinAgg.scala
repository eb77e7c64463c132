package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftExpr
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Count-min counters: D salted rows × W buckets of plain longs, merged by
  * VECTOR ADDITION — order/partition/merge-tree invariant, so the sketch
  * (and any estimate read off it) sits under the driver's exact hash gate.
  * Row hashes are the corpus-wide polynomial byte fold
  * ([[StrPolyHash]], `(h·31 + byte) mod P`) seeded with the salt prefix
  * `cm<row>`, exactly `sqlTokenHash(concat('cm<row>', tok))` in the
  * oracle; buckets are `hash % W`.
  */
final class CmsBuffer extends Serializable {
  import CmsBuffer._

  val counters = new Array[Long](D * W)

  def add(utf8: Array[Byte]): Unit = {
    var r = 0
    while (r < D) {
      counters(r * W + bucket(r, utf8)) += 1L
      r += 1
    }
  }

  def merge(other: CmsBuffer): Unit = {
    var i = 0
    while (i < D * W) { counters(i) += other.counters(i); i += 1 }
  }

  def serialize(): Array[Byte] = {
    val bb = ByteBuffer.allocate(D * W * 8)
    var i = 0
    while (i < D * W) { bb.putLong(counters(i)); i += 1 }
    bb.array()
  }
}

object CmsBuffer {
  val D = 4 // salted hash rows
  val W = 1024 // buckets per row
  val P = 1000000007L // the corpus-wide fold modulus (TextAnalysis.HashP)

  /** Fold of the `cm<r>` salt prefix — the starting state of row r's hash. */
  private val seeds: Array[Long] = Array.tabulate(D) { r =>
    "cm".concat(r.toString).getBytes("UTF-8").foldLeft(0L)((h, b) => (h * 31L + (b & 0xffL)) % P)
  }

  def bucket(row: Int, utf8: Array[Byte]): Int = {
    var h = seeds(row)
    var i = 0
    while (i < utf8.length) {
      h = (h * 31L + (utf8(i) & 0xffL)) % P
      i += 1
    }
    (h % W).toInt
  }

  def deserialize(bytes: Array[Byte]): CmsBuffer = {
    val buf = new CmsBuffer
    val bb = ByteBuffer.wrap(bytes)
    var i = 0
    while (i < D * W) { buf.counters(i) = bb.getLong; i += 1 }
    buf
  }
}

/** Heavy-hitter frequency estimation as a count-min sketch — the 100 TB
  * path to "how often does this token/n-gram occur" without shuffling the
  * full (token, count) vocabulary: the map-side partial ships one fixed
  * 32 KiB counter matrix per partition, and a point estimate is
  * `min_r counters[r][h_r(x)]` — an overcount-only bound (est ≥ truth,
  * within N·e/W with probability 1−e^-D).
  *
  * Output: ARRAY<BIGINT> of D·W counters, row-major — read estimates off
  * it relationally (element_at with the same salted fold).
  */
case class CountMinAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[CmsBuffer] {

  override def prettyName: String = "count_min"
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): CmsBuffer = new CmsBuffer

  override def update(buffer: CmsBuffer, input: InternalRow): CmsBuffer = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[UTF8String].getBytes)
    buffer
  }

  override def merge(buffer: CmsBuffer, other: CmsBuffer): CmsBuffer = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: CmsBuffer): Any = new GenericArrayData(buffer.counters)

  override def serialize(buffer: CmsBuffer): Array[Byte] = buffer.serialize()

  override def deserialize(storageFormat: Array[Byte]): CmsBuffer =
    CmsBuffer.deserialize(storageFormat)

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
}

object CountMinAgg {

  /** `countMin(col)`: the D·W counter matrix as an aggregate Column. */
  def countMin(c: Column): Column =
    GraftExpr.column(CountMinAgg(GraftExpr.expression(c.cast("string"))).toAggregateExpression())

  /** Point estimate of `tok`'s frequency from a counter array column:
    * `min_r counters[r][h_r(tok)]`, the same salted fold as the update
    * path — pure relational arithmetic over the sketch. */
  def estimate(cms: Column, tok: Column): Column = {
    import org.apache.spark.sql.functions._
    val ests = (0 until CmsBuffer.D).map { r =>
      val bucket = (graft.operators.TextAnalysis
        .tokenHash(concat(lit(s"cm$r"), tok)) % CmsBuffer.W).cast("int")
      element_at(cms, bucket + lit(r * CmsBuffer.W) + 1)
    }
    least(ests: _*)
  }
}
