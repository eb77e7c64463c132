package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Catalyst expressions for 2-byte-packed fp16/bf16 vectors ([[Half]]) —
  * the storage half of the reference's half-width element types
  * (`include/knowhere/operands.h:48-147`). Pack/unpack convert between
  * `ARRAY<FLOAT|DOUBLE>` and `BINARY(dim*2)`; the distance kernels decode
  * inline inside whole-stage codegen, so a packed scan never materializes
  * 4-byte arrays on the hot path.
  */

/** ARRAY<FLOAT|DOUBLE> → BINARY, RNE narrowing to binary16 / bfloat16. */
case class VecPackHalf(child: Expression, bf16: Boolean) extends UnaryExpression {
  override def prettyName: String = if (bf16) "vec_pack_bf16" else "vec_pack_fp16"
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<FLOAT|DOUBLE>, got $other")
  }

  private def fromDouble: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == DoubleType

  override def nullSafeEval(v: Any): Any =
    Half.pack(v.asInstanceOf[ArrayData], fromDouble, bf16)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.Half.pack($c, $fromDouble, $bf16)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** BINARY → ARRAY<FLOAT> (exact decode). */
case class VecUnpackHalf(child: Expression, bf16: Boolean) extends UnaryExpression {
  override def prettyName: String = if (bf16) "vec_unpack_bf16" else "vec_unpack_fp16"
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires BINARY, got $other")
  }

  override def nullSafeEval(v: Any): Any =
    new GenericArrayData(Half.unpack(v.asInstanceOf[Array[Byte]], bf16))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.plans.Half.unpack($c, $bf16))")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

abstract class PackedFoldExpression extends BinaryExpression {
  def bf16: Boolean
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires BINARY inputs, got ${left.dataType} / ${right.dataType}")
}

/** Σ (a_i − b_i)² over packed half-width buffers (decode-inline analog of
  * [[VecL2Sq]]; bit-identical to it on the unpacked values). */
case class VecL2SqHalf(left: Expression, right: Expression, bf16: Boolean)
    extends PackedFoldExpression {
  override def prettyName: String = if (bf16) "vec_l2sq_bf16" else "vec_l2sq_fp16"

  override def nullSafeEval(a: Any, b: Any): Any =
    Half.l2Sq(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]], bf16)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.plans.Half.l2Sq($a, $b, $bf16)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Σ a_i·b_i over packed half-width buffers. */
case class VecDotHalf(left: Expression, right: Expression, bf16: Boolean)
    extends PackedFoldExpression {
  override def prettyName: String = if (bf16) "vec_dot_bf16" else "vec_dot_fp16"

  override def nullSafeEval(a: Any, b: Any): Any =
    Half.dot(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]], bf16)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.plans.Half.dot($a, $b, $bf16)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** ARRAY<FLOAT|DOUBLE> → BINARY(dim), int8 quantization (round-half-even
  * of x·scale, clamped — the value-grid int8Storage contract at 1
  * byte/element, `operands.h` int8). */
case class VecPackInt8(child: Expression, scale: Double) extends UnaryExpression {
  override def prettyName: String = "vec_pack_int8"
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<FLOAT|DOUBLE>, got $other")
  }

  private def fromDouble: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == DoubleType

  override def nullSafeEval(v: Any): Any =
    Half.packInt8(v.asInstanceOf[ArrayData], fromDouble, scale)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.Half.packInt8($c, $fromDouble, $scale)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** BINARY → ARRAY<DOUBLE> dequantized grid values. */
case class VecUnpackInt8(child: Expression, scale: Double) extends UnaryExpression {
  override def prettyName: String = "vec_unpack_int8"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires BINARY, got $other")
  }

  override def nullSafeEval(v: Any): Any =
    new GenericArrayData(Half.unpackInt8(v.asInstanceOf[Array[Byte]], scale))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.plans.Half.unpackInt8($c, $scale))")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Σ (a_i − b_i)² over int8 buffers (dequantize-inline). */
case class VecL2SqInt8(left: Expression, right: Expression, scale: Double)
    extends PackedFoldExpression {
  override def bf16: Boolean = false
  override def prettyName: String = "vec_l2sq_int8"

  override def nullSafeEval(a: Any, b: Any): Any =
    Half.l2SqInt8(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]], scale)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.plans.Half.l2SqInt8($a, $b, $scale)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Σ a_i·b_i over int8 buffers. */
case class VecDotInt8(left: Expression, right: Expression, scale: Double)
    extends PackedFoldExpression {
  override def bf16: Boolean = false
  override def prettyName: String = "vec_dot_int8"

  override def nullSafeEval(a: Any, b: Any): Any =
    Half.dotInt8(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]], scale)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.plans.Half.dotInt8($a, $b, $scale)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
