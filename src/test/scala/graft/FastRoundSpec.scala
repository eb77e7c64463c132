package graft

import org.apache.spark.sql.functions._

/** The FastRoundRewrite contract: with the rule installed (SparkSpec
  * sessions install it, like Bench/Verify), `round(col, n)` on doubles
  * must (a) actually plan as the native fast_round kernel and (b) return
  * exactly what Spark's Round computes — BigDecimal.valueOf(x).setScale(n,
  * HALF_UP) — on boundary grids, random-magnitude values, nulls, and both
  * signs. RoundingSpec pins the scalar fast path; this spec pins the
  * Catalyst plumbing (rewrite fires, codegen path, null handling,
  * non-double and exotic-scale rounds left alone). */
class FastRoundSpec extends SparkSpec {

  private def reference(x: Double, n: Int): Double =
    java.math.BigDecimal.valueOf(x).setScale(n, java.math.RoundingMode.HALF_UP).doubleValue

  test("rewrite fires for double rounds and matches decimal HALF_UP") {
    // values derived on executors (a range leaf, NOT a LocalRelation —
    // ConvertToLocalRelation would fold the round away before the rule):
    // the k/2e4 boundary grid plus a hash-spread magnitude sweep, nulls
    // every 97th row
    val df = spark.range(-200000, 200001)
      .select(
        when(col("id") % 97 === 0, lit(null))
          .otherwise(col("id").cast("double") / 20000.0d).as("x"),
        (pmod(hash(col("id")), lit(2000000)).cast("double") / 1000.0d - 1000.0d +
          col("id").cast("double") / 20000.0d).as("y"))
      .select(
        col("x"), col("y"),
        round(col("x"), 4).as("r4"),
        round(col("y"), 4).as("ry4"),
        round(col("y"), 0).as("ry0"))
    assert(df.queryExecution.optimizedPlan.toString.contains("fast_round"),
      "FastRoundRewrite did not fire on round(double, n)")
    df.collect().foreach { r =>
      if (r.isNullAt(0)) assert(r.isNullAt(2), "null must round to null")
      else assert(r.getDouble(2) == reference(r.getDouble(0), 4), s"r4 x=${r.getDouble(0)}")
      assert(r.getDouble(3) == reference(r.getDouble(1), 4), s"ry4 y=${r.getDouble(1)}")
      assert(r.getDouble(4) == reference(r.getDouble(1), 0), s"ry0 y=${r.getDouble(1)}")
    }
  }

  test("non-double and exotic-scale rounds keep Spark's Round") {
    val dec = spark.range(1)
      .select((col("id").cast("decimal(10,5)") + lit(BigDecimal("1.23456"))).as("d"))
      .select(round(col("d"), 2).as("r"))
    assert(!dec.queryExecution.optimizedPlan.toString.contains("fast_round"))
    assert(dec.head().getDecimal(0).toString == "1.23")
    val neg = spark.range(1)
      .select((col("id").cast("double") + 12345.678d).as("x"))
      .select(round(col("x"), -2).as("r"))
    assert(!neg.queryExecution.optimizedPlan.toString.contains("fast_round"))
    assert(neg.head().getDouble(0) == 12300.0d)
  }
}
