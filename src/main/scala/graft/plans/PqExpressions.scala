package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native PQ encoder — assign each of the `m` query subvectors to its
  * nearest codeword (`faiss`-style product quantization; the reference
  * trains/encodes through faiss's PQ in `src/index/ivf/ivf.cc` and
  * DiskANN's `pq_code_budget_gb` tier).
  *
  * This replaces the relational formulation
  * `array_position(dists, array_min(dists))` over an `array(...)` of
  * m·ksub VecL2Sq nodes: correct, and fine at ksub=16, but the expression
  * tree is O(m·ksub) NODES — at m=64, ksub=256 that is 16,384 kernels per
  * row, which codegen splits into thousands of methods the JIT refuses to
  * compile (measured: one 12.5k-row partition pinned a core for 24+ min).
  * Here the codebook is ONE reference object and the argmin is a compiled
  * triple loop: m·ksub·dsub multiply-adds per row, exactly the work.
  *
  * Numeric contract (bit-identical to the formulation it replaces, which
  * the hash-gated PQ queries pin): each element casts float→double, the
  * per-codeword distance is a left-to-right Σ(v−c)², ties take the FIRST
  * minimum (array_position semantics ⇒ strict `<` update), and a subspace
  * sliced past the vector's end compares only the overlapping prefix
  * (VecL2Sq's min-length rule).
  */
case class PqEncode(
    child: Expression,
    codebooks: Array[Array[Array[Float]]], // m × ksub × dsub
    m: Int,
    ksub: Int,
    dsub: Int
) extends UnaryExpression {

  override def prettyName: String = "pq_encode"

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a float/double array input, got $other")
  }

  // flattened [s][c][i] → s·ksub·dsub + c·dsub + i (one JVM object, shared
  // across rows; also the codegen reference object)
  private lazy val flat: Array[Float] = {
    val out = new Array[Float](m * ksub * dsub)
    var s = 0
    while (s < m) {
      var c = 0
      while (c < ksub) {
        System.arraycopy(codebooks(s)(c), 0, out, (s * ksub + c) * dsub, dsub)
        c += 1
      }
      s += 1
    }
    out
  }

  private def isDouble: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == DoubleType

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val len = v.numElements()
    val dbl = isDouble
    val codes = new Array[Int](m)
    var s = 0
    while (s < m) {
      val base = s * dsub
      val n = math.min(dsub, math.max(0, len - base))
      var bestD = Double.PositiveInfinity
      var bestC = 0
      var c = 0
      while (c < ksub) {
        val cb = (s * ksub + c) * dsub
        var acc = 0.0d
        var i = 0
        while (i < n) {
          val x = if (dbl) v.getDouble(base + i) else v.getFloat(base + i).toDouble
          val d = x - flat(cb + i).toDouble
          acc += d * d
          i += 1
        }
        if (acc < bestD) { bestD = acc; bestC = c }
        c += 1
      }
      codes(s) = bestC
      s += 1
    }
    new GenericArrayData(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebooks", flat, "float[]")
    val getter = if (isDouble) "getDouble" else "getFloat"
    nullSafeCodeGen(ctx, ev, v => {
      val codes = ctx.freshName("codes")
      val len = ctx.freshName("len")
      val s = ctx.freshName("s")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val base = ctx.freshName("base")
      val cb = ctx.freshName("cb")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      val bestD = ctx.freshName("bestD")
      val bestC = ctx.freshName("bestC")
      s"""
        int $len = $v.numElements();
        int[] $codes = new int[$m];
        for (int $s = 0; $s < $m; $s++) {
          int $base = $s * $dsub;
          int $n = Math.min($dsub, Math.max(0, $len - $base));
          double $bestD = Double.POSITIVE_INFINITY;
          int $bestC = 0;
          for (int $c = 0; $c < $ksub; $c++) {
            int $cb = ($s * $ksub + $c) * $dsub;
            double $acc = 0.0;
            for (int $i = 0; $i < $n; $i++) {
              double $d = (double) $v.$getter($base + $i) - (double) $cbRef[$cb + $i];
              $acc += $d * $d;
            }
            if ($acc < $bestD) { $bestD = $acc; $bestC = $c; }
          }
          $codes[$s] = $bestC;
        }
        ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($codes);
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
