package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Serve

/** The serving-side rounding contract: `Serve.sparkRound`'s fast path
  * (plain floor pick away from the .5 boundary, exact BigDecimal inside
  * the guard band) must agree with the pure decimal HALF_UP formula —
  * Spark's `round(col, n)` — on EVERY input, including the exact
  * boundaries and negative values where HALF_UP rounds away from zero.
  * A divergence here would silently break every ServeSpec equality gate,
  * so this spec pins the grid deterministically rather than relying on
  * random distances to land near a boundary. */
class RoundingSpec extends AnyFunSuite {

  private def reference(x: Double, n: Int): Double =
    java.math.BigDecimal.valueOf(x).setScale(n, java.math.RoundingMode.HALF_UP).doubleValue

  test("fast sparkRound equals decimal HALF_UP on boundary grids, both signs") {
    // exact k/2e4 grid: every value sits ON a 4dp .5 boundary or a 4dp
    // grid point — the worst case for a floor-based fast path
    var k = -200000
    while (k <= 200000) {
      val x = k / 20000.0d
      assert(Serve.sparkRound(x, 4) == reference(x, 4), s"4dp boundary grid x=$x")
      k += 1
    }
    // near-boundary offsets on both sides, both signs
    for (i <- -50 to 50; eps <- Seq(-1e-7, -1e-9, 0.0, 1e-9, 1e-7)) {
      val x = i / 10000.0d + 0.00005d + eps
      assert(Serve.sparkRound(x, 4) == reference(x, 4), s"near-boundary x=$x")
    }
  }

  test("fast sparkRound equals decimal HALF_UP on random magnitudes and scales") {
    val rnd = new scala.util.Random(20260815L)
    for (_ <- 1 to 200000) {
      val x = (rnd.nextDouble() - 0.5d) * math.pow(10d, rnd.nextInt(9) - 2)
      assert(Serve.sparkRound(x, 4) == reference(x, 4), s"random 4dp x=$x")
    }
    for (_ <- 1 to 20000) {
      val x = (rnd.nextDouble() - 0.5d) * 1e6
      assert(Serve.sparkRound(x, 0) == reference(x, 0), s"random 0dp x=$x")
      assert(Serve.sparkRound(x, 2) == reference(x, 2), s"random 2dp x=$x")
    }
  }
}
