package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k buffer: keeps the k best (dist, id) pairs under the order
  * (dist, id) — ascending: smaller dist wins; ties broken by smaller id.
  * Max-heap-of-the-worst so insertion is O(log k).
  */
final class TopKBuffer(val k: Int, val ascending: Boolean) extends Serializable {
  // worst-first ordering for the eviction heap
  private def worseThan(d1: Double, i1: Long, d2: Double, i2: Long): Boolean =
    if (d1 != d2) { if (ascending) d1 > d2 else d1 < d2 }
    else i1 > i2

  private val heapD = new Array[Double](k)
  private val heapI = new Array[Long](k)
  private var n = 0

  def size: Int = n

  def insert(d: Double, id: Long): Unit = {
    if (n < k) {
      heapD(n) = d; heapI(n) = id; n += 1
      var i = n - 1
      while (i > 0 && worseThan(heapD(i), heapI(i), heapD((i - 1) / 2), heapI((i - 1) / 2))) {
        swap(i, (i - 1) / 2); i = (i - 1) / 2
      }
    } else if (k > 0 && worseThan(heapD(0), heapI(0), d, id)) {
      heapD(0) = d; heapI(0) = id
      siftDown(0)
    }
  }

  private def swap(a: Int, b: Int): Unit = {
    val td = heapD(a); heapD(a) = heapD(b); heapD(b) = td
    val ti = heapI(a); heapI(a) = heapI(b); heapI(b) = ti
  }

  private def siftDown(start: Int): Unit = {
    var i = start
    var done = false
    while (!done) {
      val l = 2 * i + 1
      val r = 2 * i + 2
      var w = i
      if (l < n && worseThan(heapD(l), heapI(l), heapD(w), heapI(w))) w = l
      if (r < n && worseThan(heapD(r), heapI(r), heapD(w), heapI(w))) w = r
      if (w == i) done = true
      else { swap(i, w); i = w }
    }
  }

  /** Best-first (dist, id) pairs. */
  def sorted: Array[(Double, Long)] = {
    val arr = (0 until n).map(i => (heapD(i), heapI(i))).toArray
    arr.sortWith((a, b) =>
      if (a._1 != b._1) { if (ascending) a._1 < b._1 else a._1 > b._1 }
      else a._2 < b._2)
  }

  def merge(other: TopKBuffer): Unit = {
    var i = 0
    while (i < other.n) { insert(other.heapD(i), other.heapI(i)); i += 1 }
  }

  def serialize(): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + n * 16)
    bb.putInt(n)
    var i = 0
    while (i < n) { bb.putDouble(heapD(i)); bb.putLong(heapI(i)); i += 1 }
    bb.array()
  }
}

object TopKBuffer {
  def deserialize(bytes: Array[Byte], k: Int, ascending: Boolean): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopKBuffer(k, ascending)
    var i = 0
    while (i < n) { buf.insert(bb.getDouble, bb.getLong); i += 1 }
    buf
  }
}

/** Bounded per-group top-k as a TypedImperativeAggregate — the reference's
  * MaxMinHeap / faiss heap top-k (`include/knowhere/sparse_utils.h:258-320`,
  * `include/knowhere/heap.h`) as a Catalyst aggregate.
  *
  * Scale rationale vs `row_number() OVER (PARTITION BY qid)`: the window
  * sorts and shuffles ALL nq×nb candidate rows; this aggregate keeps a
  * k-bounded heap per query with map-side partial aggregation, so the
  * shuffle carries at most nq×k×partitions rows. Result rows and order are
  * identical (same (dist, id) tie-break).
  *
  * Output: ARRAY<STRUCT<dist: DOUBLE, id: BIGINT>> best-first.
  */
case class TopKAgg(
    dist: Expression,
    id: Expression,
    k: Int,
    ascending: Boolean,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[TopKBuffer] {

  override def prettyName: String = "topk_agg"
  override def children: Seq[Expression] = Seq(dist, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("dist", DoubleType), StructField("id", LongType))))

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k, ascending)

  override def update(buffer: TopKBuffer, input: InternalRow): TopKBuffer = {
    val d = dist.eval(input)
    val i = id.eval(input)
    if (d != null && i != null) {
      buffer.insert(d.asInstanceOf[Double], i.asInstanceOf[Long])
    }
    buffer
  }

  override def merge(buffer: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: TopKBuffer): Any =
    new GenericArrayData(buffer.sorted.map { case (d, i) => InternalRow(d, i) })

  override def serialize(buffer: TopKBuffer): Array[Byte] = buffer.serialize()

  override def deserialize(storageFormat: Array[Byte]): TopKBuffer =
    TopKBuffer.deserialize(storageFormat, k, ascending)

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(dist = newChildren(0), id = newChildren(1))
}
