package graft

import org.apache.spark.sql.functions._

import graft.plans.{CmsBuffer, CountMinAgg}

/** The count-min sketch: overcount-only bound, merge laws, partition-order
  * invariance, and behavior in the collision regime (keys ≫ buckets). */
class CountMinSpec extends SparkSpec {
  import spark.implicits._

  private lazy val toks = spark.read.parquet(s"$sf0001/documents.parquet")
    .select(explode(split(col("text"), " ")).as("tok"))

  test("estimates never undercount and match exact counts off-collision") {
    val counters = toks.agg(CountMinAgg.countMin(col("tok")).as("cms"))
    val checked = toks.groupBy(col("tok")).agg(count(lit(1)).as("n_exact"))
      .crossJoin(broadcast(counters))
      .select(col("tok"), col("n_exact"),
        CountMinAgg.estimate(col("cms"), col("tok")).as("n_est"))
      .collect()
    assert(checked.nonEmpty)
    checked.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1), s"undercount for ${r.getString(0)}")
    }
    // ~50-token vocabulary vs 1024 buckets: collisions are improbable in
    // every one of the 4 rows at once — estimates should be exact
    assert(checked.forall(r => r.getLong(2) == r.getLong(1)))
  }

  test("collision regime (40k keys, 1024 buckets): min-over-rows still bounds above") {
    val sk = new CmsBuffer
    (0 until 40000).foreach(i => sk.add(s"key$i".getBytes("UTF-8")))
    sk.add("key7".getBytes("UTF-8")) // key7 true count = 2
    def est(tok: String): Long = {
      val b = tok.getBytes("UTF-8")
      (0 until CmsBuffer.D).map(r => sk.counters(r * CmsBuffer.W + CmsBuffer.bucket(r, b))).min
    }
    assert(est("key7") >= 2)
    // with 40k keys over 4×1024 counters the average bucket holds ~39
    // keys — the min-over-rows estimate must stay within the classic
    // eN/W bound (e≈2.72, N≈40k, W=1024 → ~107) with huge slack
    assert(est("key7") <= 2 + 400, s"estimate ${est("key7")} far above the CMS bound")
  }

  test("sketch is bit-identical across partitionings (vector-add merge)") {
    def run(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      df.agg(CountMinAgg.countMin(col("tok")).as("cms"))
        .head().getSeq[Long](0)
    val a = run(toks.repartition(1))
    val b = run(toks.repartition(23, col("tok")))
    val c = run(toks.orderBy(desc("tok")).repartition(5))
    assert(a == b && a == c)
  }

  test("merge equals the one-pass sketch and totals are conserved per row") {
    val keys = (0 until 5000).map(i => s"w${i % 700}")
    val (x, y) = keys.splitAt(1700)
    def sk(xs: Seq[String]): CmsBuffer = {
      val s = new CmsBuffer
      xs.foreach(k => s.add(k.getBytes("UTF-8")))
      s
    }
    val whole = sk(keys)
    val merged = sk(x); merged.merge(sk(y))
    assert(merged.counters.toSeq == whole.counters.toSeq)
    // every hash row counts every insertion exactly once
    (0 until CmsBuffer.D).foreach { r =>
      val rowTotal = (0 until CmsBuffer.W).map(i => whole.counters(r * CmsBuffer.W + i)).sum
      assert(rowTotal == keys.size)
    }
  }
}
