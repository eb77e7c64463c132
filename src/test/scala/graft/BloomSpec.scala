package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.plans.{BloomAgg, LongBloom}

/** The long-key bloom filter: no false negatives ever, false-positive rate
  * in the expected regime, OR-merge partition invariance, and the
  * bloom-prefiltered decontamination path agreeing with the exact one. */
class BloomSpec extends SparkSpec {
  import spark.implicits._

  test("no false negatives; FP rate near the theoretical bound") {
    val bloom = LongBloom.empty(log2Bits = 16, k = 4)
    val members = (0L until 2000L).map(i => i * 0x9e3779b97f4a7c15L + i)
    members.foreach(bloom.add)
    assert(members.forall(bloom.mightContain), "bloom false negative")
    // n=2000 keys in m=65536 bits, k=4 → (1-e^(-kn/m))^k ≈ 1.6e-4; test
    // 100k non-members and allow 50× slack on the expectation (~16)
    val fps = (1L to 100000L).count(i => bloom.mightContain(-i))
    assert(fps < 800, s"FP rate too high: $fps / 100000")
  }

  test("distributed build is bit-identical across partitionings (OR merge)") {
    val keys = spark.range(0, 5000).select((col("id") * 7919L).as("x"))
    def build(df: org.apache.spark.sql.DataFrame): Seq[Byte] =
      df.agg(BloomAgg.bloomBuild(col("x"), 14, 4).as("b")).head().getAs[Array[Byte]](0).toSeq
    assert(build(keys.repartition(1)) == build(keys.repartition(13)))
  }

  test("codegen'd probe agrees with the Scala-side probe") {
    val bloom = LongBloom.empty(log2Bits = 12, k = 3)
    (0L until 500L).foreach(i => bloom.add(i * 31L))
    val probed = spark
      .range(0, 2000)
      .select(col("id").as("x"))
      .filter(BloomAgg.bloomMightContain(col("x"), bloom))
      .as[Long]
      .collect()
      .toSet
    val expected = (0L until 2000L).filter(bloom.mightContain).toSet
    assert(probed == expected)
  }

  test("bloom-prefiltered decontamination equals the exact broadcast path") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val pred = col("doc_id") % 89 === 0
    val exact = Dedup.decontaminate(docs, pred)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val bloomed = Dedup.decontaminateBloom(docs, pred)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    assert(bloomed == exact)
  }
}
