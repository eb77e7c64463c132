package graft

import org.apache.spark.sql.functions._

/** The FastSplitRewrite contract: with the rule installed, `split(c, " ")`
  * must plan as the byte-scan split_space kernel and return exactly what
  * Java's `"…".split(" ", -1)` (Spark's StringSplit semantics) returns —
  * including consecutive/leading/trailing separators, empty input, and
  * multi-byte UTF-8; other patterns/limits keep Spark's StringSplit. */
class FastSplitSpec extends SparkSpec {

  test("rewrite fires and matches Java split(\" \", -1) semantics") {
    val cases = Seq(
      "a b c", " a b", "a b ", "  ", "", "solo", "a  b", "héllo wörld ", "→ ← x",
      "ends with two  ", " leading", "a b  c   d ")
    // range leaf so ConvertToLocalRelation cannot fold the split away
    val df = spark.range(cases.length)
      .select(element_at(
        typedLit(cases), col("id").cast("int") + 1).as("t"))
      .select(col("t"), split(col("t"), " ").as("parts"))
    assert(df.queryExecution.optimizedPlan.toString.contains("split_space"),
      "FastSplitRewrite did not fire on split(str, \" \")")
    df.collect().foreach { r =>
      val expect = r.getString(0).split(" ", -1).toSeq
      assert(r.getSeq[String](1) == expect, s"input='${r.getString(0)}'")
    }
  }

  test("other patterns and explicit limits keep Spark's StringSplit") {
    val df = spark.range(1).select(lit("a,b, c").as("t"))
    val other = df.select(split(col("t"), ",").as("p"))
    assert(!other.queryExecution.optimizedPlan.toString.contains("split_space"))
    assert(other.head().getSeq[String](0) == Seq("a", "b", " c"))
    val limited = df.select(split(col("t"), " ", 1).as("p"))
    assert(!limited.queryExecution.optimizedPlan.toString.contains("split_space"))
    assert(limited.head().getSeq[String](0) == Seq("a,b, c"))
  }
}
