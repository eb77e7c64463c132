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

  test("NaN and infinities pass through unchanged, like Spark's RoundBase") {
    import org.apache.spark.sql.catalyst.expressions.{Literal, Round}
    // pin the Spark contract itself: RoundBase on doubles early-returns
    // NaN/±Inf (4.1.2 bytecode) — if an upgrade changes that, this fails
    // before the kernel comparison below can mislead
    for (x <- Seq(Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity)) {
      val sparkV = Round(Literal(x), Literal(4)).eval().asInstanceOf[Double]
      val fastV = graft.plans.FastRound.round(x, 4)
      assert(
        java.lang.Double.doubleToLongBits(sparkV) ==
          java.lang.Double.doubleToLongBits(fastV),
        s"x=$x spark=$sparkV fast=$fastV")
    }
    // and through the rewritten DataFrame path (zero-norm cosine regime);
    // the specials ride a non-foldable `when` so nothing constant-folds
    // (ANSI mode forbids the x/0 construction)
    val df = spark.range(3)
      .select(
        when(col("id") === 0, lit(Double.NaN))
          .when(col("id") === 1, lit(Double.PositiveInfinity))
          .otherwise(lit(Double.NegativeInfinity)).as("x"))
      .select(col("x"), round(col("x"), 4).as("r"))
    assert(df.queryExecution.optimizedPlan.toString.contains("fast_round"))
    df.collect().foreach { r =>
      assert(
        java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
          java.lang.Double.doubleToLongBits(r.getDouble(1)),
        s"x=${r.getDouble(0)} r=${r.getDouble(1)}")
    }
  }

  test("large magnitudes: |x*10^n| in (1e9, 2^52) matches decimal HALF_UP") {
    // the scaled guard band's regime: the double-multiply error exceeds a
    // FIXED 1e-6 band past |y| ~ 1e10, so sweep magnitudes up to the 2^52
    // deferral with boundary-adjacent fractions (k + 0.5 ± tiny)
    val df = spark.range(1, 60001)
      .select(
        (col("id").cast("double") * 7.4999e8d + lit(0.5d) +
          (pmod(hash(col("id")), lit(2001)).cast("double") - 1000.0d) * 1e-7d).as("x"),
        (col("id").cast("double") * 7.4999e4d +
          pmod(hash(col("id") + 7), lit(100000)).cast("double") * 1e-5d).as("y"))
      .select(
        col("x"), col("y"),
        round(col("x"), 0).as("rx0"),
        round(col("y"), 4).as("ry4"))
    assert(df.queryExecution.optimizedPlan.toString.contains("fast_round"))
    df.collect().foreach { r =>
      assert(r.getDouble(2) == reference(r.getDouble(0), 0), s"rx0 x=${r.getDouble(0)}")
      assert(r.getDouble(3) == reference(r.getDouble(1), 4), s"ry4 y=${r.getDouble(1)}")
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
