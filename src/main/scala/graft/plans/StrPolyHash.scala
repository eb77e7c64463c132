package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial string hash: fold (h·31 + byte) mod P over the UTF-8 bytes.
  *
  * Codegen'd replacement for the per-character HOF fold
  * (`aggregate(sequence(1, length(tok)), 0L, (h,i) -> (h*31 +
  * ascii(substr(tok,i,1))) % P)`) — byte-identical for ASCII input (the
  * corpus), ~100× faster (one virtual call per string vs O(len) interpreted
  * expression nodes).
  */
case class StrPolyHash(child: Expression, mod: Long = 1000000007L) extends UnaryExpression {

  override def prettyName: String = "str_poly_hash"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires STRING, got ${child.dataType}")

  override def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String]
    val n = s.numBytes()
    var h = 0L
    var i = 0
    while (i < n) {
      h = (h * 31L + (s.getByte(i) & 0xffL)) % mod
      i += 1
    }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.StrPolyHash.hash($c, ${mod}L)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object StrPolyHash {
  /** Called from generated code. */
  def hash(s: UTF8String, mod: Long): Long = {
    val n = s.numBytes()
    var h = 0L
    var i = 0
    while (i < n) {
      h = (h * 31L + (s.getByte(i) & 0xffL)) % mod
      i += 1
    }
    h
  }
}
