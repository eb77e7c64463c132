package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Round, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Fast HALF_UP double rounding — the single implementation behind both
  * the serving scans (`Serve.sparkRound` delegates here) and the
  * [[FastRoundExpr]] kernel that [[FastRoundRewrite]] swaps in for Spark's
  * `Round` on doubles.
  *
  * Spark's `Round` on a DoubleType child evaluates
  * `BigDecimal.valueOf(x).setScale(n, HALF_UP).doubleValue` PER ROW —
  * `BigDecimal.valueOf` routes through `Double.toString` (shortest decimal
  * repr), measured ~1-2 µs/row, ≈10× the distance arithmetic it wraps.
  * Every query in this repo rounds before ranking (the oracle's 4dp
  * contract) and BM25 rounds per (query-term × posting) row, so this sat
  * in the innermost loop of most of the bench (thread dumps showed
  * `FloatingDecimal.getBinaryToASCIIConverter` / `BigDecimal.valueOf`
  * across the vector families).
  *
  * Fast path: away from the .5 boundary the decimal HALF_UP pick provably
  * equals the plain floor pick — the shortest-repr decimal and the double
  * product x·10ⁿ differ by O(1e-16·|x·10ⁿ|), far inside the guard band —
  * so only boundary-band values and |x·10ⁿ| beyond 2^52 take the exact
  * BigDecimal path (where the double grid is coarser than integers, or
  * the sign-split HALF_UP choice actually matters). The band scales with
  * the magnitude, max(1e-6, |y|·4e-16): the 4e-16 term covers both the
  * one-multiply rounding of y = x·10ⁿ (≤ ulp(y)/2 ≈ |y|·1.1e-16) and the
  * shortest-decimal-vs-binary gap BigDecimal.valueOf sees (≤ ulp(x)/2,
  * another ≈ |y|·1.1e-16 after scaling), so the fast pick can never sit
  * on the wrong side of a boundary the exact path would cross.
  * NaN/Infinity return unchanged, exactly like Spark's RoundBase on
  * doubles (verified in the 4.1.2 bytecode: isNaN/isInfinite early
  * return). `+ 0.0` normalizes a `-0.0` fast-path result to the `+0.0`
  * BigDecimal always produces (it has no signed zero). Gated by
  * RoundingSpec's boundary grids and by every hash-gated oracle query.
  */
object FastRound {
  private val Pow10: Array[Double] =
    (0 to 15).map(i => math.pow(10d, i.toDouble)).toArray

  def round(x: Double, n: Int): Double = {
    if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x)) return x
    val scale = if (n >= 0 && n <= 15) Pow10(n) else math.pow(10d, n.toDouble)
    val y = x * scale
    // |y| beyond 2^52: the double grid is coarser than integers — defer
    if (java.lang.Math.abs(y) > 4.503599627370496e15)
      return java.math.BigDecimal.valueOf(x)
        .setScale(n, java.math.RoundingMode.HALF_UP).doubleValue
    val band = java.lang.Math.max(1e-6d, java.lang.Math.abs(y) * 4e-16d)
    val f = java.lang.Math.floor(y)
    val frac = y - f
    if (frac > 0.5d + band) (f + 1.0d) / scale + 0.0d
    else if (frac < 0.5d - band) f / scale + 0.0d
    else // boundary band: exact decimal semantics (sign-aware HALF_UP)
      java.math.BigDecimal.valueOf(x)
        .setScale(n, java.math.RoundingMode.HALF_UP).doubleValue
  }
}

/** Codegen'd twin of `Round(child, n)` for DoubleType — identical values
  * (see [[FastRound.round]]), identical nullability (Round declares
  * `nullable = true` unconditionally; so does this), and foldable like
  * Round so literal rounding still constant-folds. */
case class FastRoundExpr(child: Expression, n: Int) extends UnaryExpression {

  override def prettyName: String = "fast_round"

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true // matches RoundBase.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a double input, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    FastRound.round(input.asInstanceOf[Double], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.plans.FastRound.round($v, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Optimizer rule: `Round(c: double, lit n)` with 0 ≤ n ≤ 9 →
  * [[FastRoundExpr]]. One chokepoint instead of touching ~150 call
  * sites; decimal/float/integral rounds and exotic scales keep Spark's
  * Round. Installed by `SessionTuning.install` (Bench/Verify/tests). */
object FastRoundRewrite extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case r: Round if r.child.dataType == DoubleType && r.scale.foldable =>
        r.scale.eval() match {
          case n: Int if n >= 0 && n <= 9 => FastRoundExpr(r.child, n)
          case _ => r
        }
    }
}
