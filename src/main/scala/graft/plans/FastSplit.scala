package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, StringSplit, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Byte-scan single-space split. Spark's `split(text, " ")` routes through
  * `UTF8String.split` → `toString()` → Java regex split → re-encode every
  * token: a full String decode plus a regex engine pass per row. jstack of
  * the dedup/LSH family showed `UTF8String.split` as its top executor
  * frame (23% of runnable samples) — `tokens()` / the postings tokenizer
  * sit under every dedup, sparse and text-analysis query.
  *
  * Semantics: identical to Java `"…".split(" ", -1)` — consecutive
  * separators yield empty tokens, a leading separator yields a leading
  * empty token, trailing empties are KEPT (limit −1), empty input yields
  * `[""]`. Splitting on the 0x20 byte is exact for any valid UTF-8 (a
  * space byte never occurs inside a multi-byte sequence). */
object FastSplit {
  def space(s: UTF8String): GenericArrayData = {
    val b = s.getBytes
    var count = 1
    var i = 0
    while (i < b.length) { if (b(i) == ' ') count += 1; i += 1 }
    val out = new Array[AnyRef](count)
    var start = 0
    var k = 0
    i = 0
    while (i < b.length) {
      if (b(i) == ' ') {
        out(k) = UTF8String.fromBytes(b, start, i - start)
        k += 1
        start = i + 1
      }
      i += 1
    }
    out(k) = UTF8String.fromBytes(b, start, b.length - start)
    new GenericArrayData(out)
  }
}

/** Codegen'd twin of `StringSplit(str, " ", -1)` — identical values and
  * schema (ArrayType(StringType, containsNull = false), like StringSplit). */
case class SplitSpaceExpr(child: Expression) extends UnaryExpression {

  override def prettyName: String = "split_space"

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    FastSplit.space(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.plans.FastSplit.space($v);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Optimizer rule: `split(str, " ")` (literal single-space regex, limit −1,
  * string child) → [[SplitSpaceExpr]]. Any other pattern/limit keeps
  * Spark's StringSplit. Installed by `SessionTuning.install`. */
object FastSplitRewrite extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case StringSplit(str, Literal(sep: UTF8String, StringType), Literal(-1, IntegerType))
          if sep.toString == " " && str.dataType == StringType =>
        SplitSpaceExpr(str)
    }
}
