package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftExpr
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** Fixed-width histogram counts: the deterministic mergeable quantile
  * sketch. Buckets are width 1/8 over [0, 1024) (8192 of them; the scale
  * is a power of two, so `value * 8` never rounds), counts merge by
  * VECTOR ADDITION — commutative and associative, so the sketch is
  * independent of row order, partitioning, and merge-tree shape, and its
  * quantile read-off can sit under the driver's exact hash gate.
  */
final class HistogramBuffer extends Serializable {
  import HistogramBuffer._

  val counts = new Array[Long](Buckets)

  def add(value: Double): Unit = {
    // caller pre-rounds (round(value, 6)); ×8 is exact, floor deterministic
    val b = math.floor(value * Scale).toLong
    val clamped = if (b < 0) 0 else if (b >= Buckets) Buckets - 1 else b.toInt
    counts(clamped) += 1
  }

  def merge(other: HistogramBuffer): Unit = {
    var i = 0
    while (i < Buckets) { counts(i) += other.counts(i); i += 1 }
  }

  /** Lower edge of the smallest bucket whose cumulative count reaches the
    * p-th percentile: `100·cum ≥ p·total`, all in long arithmetic; the
    * final `/8.0` is an exact dyadic division. */
  def quantile(p: Int, total: Long): Double = {
    var cum = 0L
    var i = 0
    while (i < Buckets) {
      cum += counts(i)
      if (100L * cum >= p.toLong * total) return i.toDouble / Scale
      i += 1
    }
    (Buckets - 1).toDouble / Scale
  }

  def total: Long = {
    var t = 0L
    var i = 0
    while (i < Buckets) { t += counts(i); i += 1 }
    t
  }

  def serialize(): Array[Byte] = {
    val bb = ByteBuffer.allocate(Buckets * 8)
    var i = 0
    while (i < Buckets) { bb.putLong(counts(i)); i += 1 }
    bb.array()
  }
}

object HistogramBuffer {
  val Scale = 8 // bucket width 1/8 — a power of two, so ×Scale is exact
  val Buckets = 8192 // domain [0, 1024); out-of-range clamps to the edges

  def deserialize(bytes: Array[Byte]): HistogramBuffer = {
    val buf = new HistogramBuffer
    val bb = ByteBuffer.wrap(bytes)
    var i = 0
    while (i < Buckets) { buf.counts(i) = bb.getLong; i += 1 }
    buf
  }
}

/** Mergeable quantile sketch over a bounded numeric domain — the
  * deterministic counterpart of KLL/t-digest for the 100 TB pipeline:
  * where the exact percentile query shuffles and sorts EVERY value, this
  * aggregate ships one fixed 64 KiB count vector per (group, partition)
  * and reads quantiles off the cumulative counts. Accuracy is the bucket
  * width (1/8 absolute), not rank-relative — the right trade for metric
  * dashboards over known ranges.
  *
  * Output: STRUCT<p50, p95, p99> of bucket lower edges.
  */
case class HistogramQuantileAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[HistogramBuffer] {

  override def prettyName: String = "hist_quantiles"
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("p50", DoubleType),
    StructField("p95", DoubleType),
    StructField("p99", DoubleType)))

  override def createAggregationBuffer(): HistogramBuffer = new HistogramBuffer

  override def update(buffer: HistogramBuffer, input: InternalRow): HistogramBuffer = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[Double])
    buffer
  }

  override def merge(buffer: HistogramBuffer, other: HistogramBuffer): HistogramBuffer = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: HistogramBuffer): Any = {
    val t = buffer.total
    InternalRow(buffer.quantile(50, t), buffer.quantile(95, t), buffer.quantile(99, t))
  }

  override def serialize(buffer: HistogramBuffer): Array[Byte] = buffer.serialize()

  override def deserialize(storageFormat: Array[Byte]): HistogramBuffer =
    HistogramBuffer.deserialize(storageFormat)

  override def withNewMutableAggBufferOffset(newOffset: Int): HistogramQuantileAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HistogramQuantileAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
}

object HistogramQuantileAgg {

  /** `histQuantiles(col)`: STRUCT<p50, p95, p99> — pre-round the column
    * (e.g. `round(col, 6)`) so the engine's round semantics, not the
    * sketch's, decide boundary values. */
  def histQuantiles(c: Column): Column =
    GraftExpr.column(
      HistogramQuantileAgg(GraftExpr.expression(c.cast("double"))).toAggregateExpression())
}
