package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL registration of the native kernels: `vec_l2sq(a, b)` and
  * `vec_dot(a, b)` become plain SQL functions, so the engine's distance
  * surface is reachable from `spark.sql(...)` exactly like built-ins —
  * the registry analog of the reference's kernel hook table
  * (`src/simd/hook.cc`).
  *
  * Two entry points:
  *   - `GraftFunctions.register(spark)` — programmatic, any live session;
  *   - `spark.sql.extensions=graft.plans.GraftExtensions` — config-driven
  *     injection at session build (SparkSessionExtensions).
  */
object GraftFunctions {

  private val fns: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("vec_l2sq", "squared L2 distance between two numeric arrays",
      (e: Seq[Expression]) => { require(e.length == 2, "vec_l2sq(a, b)"); VecL2Sq(e(0), e(1)) }),
    ("vec_dot", "inner product of two numeric arrays",
      (e: Seq[Expression]) => { require(e.length == 2, "vec_dot(a, b)"); VecDot(e(0), e(1)) })
  )

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "", "", "built-in")

  /** Register into a live session's function registry. */
  def register(spark: SparkSession): Unit =
    fns.foreach { case (name, usage, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(FunctionIdentifier(name), info(name, usage), builder)
    }

  private[plans] def inject(ext: SparkSessionExtensions): Unit =
    fns.foreach { case (name, usage, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info(name, usage), builder))
    }
}

/** `spark.sql.extensions` entry point. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = GraftFunctions.inject(ext)
}
