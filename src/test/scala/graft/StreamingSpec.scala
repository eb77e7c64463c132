package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators._
import graft.sources.Tables
import graft.streaming.StreamingIndex

/** CC-index analog: search concurrent with streaming ingest
  * (`tests/ut/test_ivfflat_cc.cc` shape). */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("streaming append grows the snapshot; search sees new vectors") {
    val tmp = Files.createTempDirectory("graft-stream").toString
    val srcDir = s"$tmp/src"
    val growDir = s"$tmp/grow"
    val ckptDir = s"$tmp/ckpt"

    val sealedDf = Seq((0L, Array(0f, 0f)), (1L, Array(1f, 0f))).toDF("id", "vec")
    val queries = Seq((9L, Array(0f, 0f))).toDF("qid", "qvec")

    // batch 1 arrives
    Seq((2L, Array(0.1f, 0f))).toDF("id", "vec").write.parquet(s"$srcDir/b1")
    val q1 = StreamingIndex.startAppend(spark, s"$srcDir/*", sealedDf.schema, growDir, ckptDir)
    q1.awaitTermination()

    val r1 = StreamingIndex
      .searchSnapshot(spark, queries, sealedDf, growDir, k = 3)
      .collect()
      .map(_.getAs[Long]("nid"))
      .toSet
    assert(r1 == Set(0L, 1L, 2L))

    // batch 2 arrives; restart the AvailableNow stream (same checkpoint →
    // exactly-once append of only the new files)
    Seq((3L, Array(0.05f, 0f))).toDF("id", "vec").write.parquet(s"$srcDir/b2")
    val q2 = StreamingIndex.startAppend(spark, s"$srcDir/*", sealedDf.schema, growDir, ckptDir)
    q2.awaitTermination()

    val r2 = StreamingIndex
      .searchSnapshot(spark, queries, sealedDf, growDir, k = 3)
      .collect()
      .map(_.getAs[Long]("nid"))
      .toSet
    assert(r2 == Set(0L, 2L, 3L)) // id 3 closer than id 1 now
  }

  test("IVF_FLAT_CC analog: micro-batch append assigns to lists; probed search sees new vectors") {
    import graft.operators.{IvfIndex, Metric}
    val tmp = Files.createTempDirectory("graft-ivfcc").toString
    val cents = Seq((0L, Array(0f, 0f)), (1L, Array(10f, 0f))).toDF("cluster_id", "centroid")
    val sealedVecs = Seq((0L, Array(0.5f, 0f)), (1L, Array(9.5f, 0f))).toDF("id", "vec")
    val sealedIdx = IvfIndex.build(sealedVecs, cents)
    // a new vector near centroid 0 streams in and is assigned in-flight
    Seq((5L, Array(0.2f, 0f))).toDF("id", "vec").write.parquet(s"$tmp/src/b1")
    StreamingIndex
      .startAppendIvf(spark, s"$tmp/src/*", sealedVecs.schema, cents, s"$tmp/grow", s"$tmp/ckpt")
      .awaitTermination()
    // growing segment is list-partitioned on disk
    assert(new java.io.File(s"$tmp/grow/cluster_id=0").exists())
    val growing = spark.read.parquet(s"$tmp/grow")
      .select(col("id"), col("vec"), col("cluster_id"))
    val snapshot = sealedIdx.select(col("id"), col("vec"), col("cluster_id"))
      .unionByName(growing)
    val q = Seq((9L, Array(0f, 0f))).toDF("qid", "qvec")
    val got = IvfIndex.search(q, snapshot, cents, k = 2, nprobe = 1, Metric.L2)
      .collect().map(_.getAs[Long]("nid")).toSet
    assert(got == Set(0L, 5L)) // probed list only, new vector visible
  }
}

/** V9 Serialize/Deserialize: the index ↔ storage round-trip is a parquet
  * write partitioned by cluster_id (partition pruning at probe time) and a
  * read back — results must be identical. */
class StreamingSessionsSpec extends SparkSpec {
  import spark.implicits._

  test("mapGroupsWithState carries sessions across micro-batches without double-counting") {
    import org.apache.spark.sql.streaming.Trigger
    import java.nio.file.attribute.FileTime
    // user 1: events at t=0m and t=35m (batch 1), then t=40m (batch 2) —
    // 40m is within 30min of 35m, so it must NOT open a new session;
    // user 2: one event per batch, 2h apart — two sessions.
    val base = 1700000000000000L // micros
    val m = 60000000L
    def df(rows: Seq[(Long, Long, Long)]) =
      rows.toDF("user_id", "event_id", "tsm")
        .select(col("user_id"), col("event_id"), timestamp_micros(col("tsm")).as("ts"))
    val stage = java.nio.file.Files.createTempDirectory("graft-sess-spec")
    df(Seq((1L, 1L, base), (1L, 2L, base + 35 * m), (2L, 10L, base)))
      .coalesce(1).write.parquet(s"$stage/b0")
    df(Seq((1L, 3L, base + 40 * m), (2L, 11L, base + 120 * m)))
      .coalesce(1).write.parquet(s"$stage/b1")
    def touch(p: String, t: Long): Unit =
      java.nio.file.Files.walk(java.nio.file.Paths.get(p)).forEach(f =>
        java.nio.file.Files.setLastModifiedTime(f, FileTime.fromMillis(t)))
    val now = System.currentTimeMillis()
    touch(s"$stage/b0", now - 120000); touch(s"$stage/b1", now - 60000)
    val src = spark.readStream
      .schema(spark.read.parquet(s"$stage/b0").schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$stage/b*")
    val q = streaming.StreamingSessions
      .sessionUpdates(src, gapMicros = 1800000000L)
      .writeStream.format("memory").queryName("sess_spec")
      .outputMode("update").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("sess_spec")
      .groupBy("user_id")
      .agg(max("n_sessions").as("ns"), max("n_events").as("ne"))
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2)))).toMap
    assert(got(1L) == ((2, 3L))) // sessions: {t0}, {35m, 40m} — boundary join
    assert(got(2L) == ((2, 2L)))
    // the state path really ran in two batches
    assert(q.recentProgress.count(_.numInputRows > 0) == 2)
  }

  test("streaming distinct-users is batch-split invariant (dedup state persists)") {
    import org.apache.spark.sql.streaming.Trigger
    import java.nio.file.attribute.FileTime
    import spark.implicits._
    // user 7 appears for type 'a' in BOTH batches — the cross-batch dup
    // must count once; user 8 is new in batch 2.
    def df(rows: Seq[(String, Long)]) = rows.toDF("event_type", "user_id")
    val stage = java.nio.file.Files.createTempDirectory("graft-distinct-spec")
    df(Seq(("a", 7L), ("a", 1L), ("b", 7L))).coalesce(1).write.parquet(s"$stage/b0")
    df(Seq(("a", 7L), ("a", 8L), ("b", 2L))).coalesce(1).write.parquet(s"$stage/b1")
    def touch(p: String, t: Long): Unit =
      java.nio.file.Files.walk(java.nio.file.Paths.get(p)).forEach(f =>
        java.nio.file.Files.setLastModifiedTime(f, FileTime.fromMillis(t)))
    val now = System.currentTimeMillis()
    touch(s"$stage/b0", now - 120000); touch(s"$stage/b1", now - 60000)
    val src = spark.readStream
      .schema(spark.read.parquet(s"$stage/b0").schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$stage/b*")
    val q = src
      .dropDuplicates("event_type", "user_id")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_users"))
      .writeStream.format("memory").queryName("distinct_spec")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("distinct_spec").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a" -> 3L, "b" -> 2L)) // batch distinct of the union
    assert(q.recentProgress.count(_.numInputRows > 0) == 2)
  }

  test("corpus dashboard stream: out-of-order replay (late docs after emit) matches batch") {
    import org.apache.spark.sql.streaming.Trigger
    import java.nio.file.attribute.FileTime
    // every source's docs are split across ALL THREE batches, replayed out
    // of id order — batch 0 carries the HIGHEST ids, so when a source's
    // early docs finally arrive (batches 1-2) the source has already
    // emitted update rows. The GroupState render must still equal the
    // batch aggregate: state carries exact-long sums, and renderFinal
    // folds max_by(n_docs), so late arrivals only ever extend the sums.
    val docs = Tables.documents(spark, sf0001)
    val n = docs.count()
    val (t1, t2) = (n / 3, 2 * n / 3)
    val stage = java.nio.file.Files.createTempDirectory("graft-srcstats-ooo")
    docs.filter(col("doc_id") >= t2).coalesce(1).write.parquet(s"$stage/b0")
    docs.filter(col("doc_id") < t1).coalesce(1).write.parquet(s"$stage/b1")
    docs.filter(col("doc_id") >= t1 && col("doc_id") < t2)
      .coalesce(1).write.parquet(s"$stage/b2")
    def touch(p: String, t: Long): Unit =
      java.nio.file.Files.walk(java.nio.file.Paths.get(p)).forEach(f =>
        java.nio.file.Files.setLastModifiedTime(f, FileTime.fromMillis(t)))
    val now = System.currentTimeMillis()
    touch(s"$stage/b0", now - 180000)
    touch(s"$stage/b1", now - 120000)
    touch(s"$stage/b2", now - 60000)
    val src = spark.readStream
      .schema(spark.read.parquet(s"$stage/b0").schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$stage/b*")
    val q = graft.streaming.StreamingCorpusStats
      .sourceStatsUpdates(src)
      .writeStream.format("memory").queryName("srcstats_ooo")
      .outputMode("update").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).sortBy(_._1).toSeq
    val streamed = canon(graft.streaming.StreamingCorpusStats
      .renderFinal(spark.table("srcstats_ooo")))
    val batch = canon(TextAnalysis.corpusSourceStats(docs))
    assert(streamed == batch)
    assert(q.recentProgress.count(_.numInputRows > 0) == 3,
      "replay must run as three distinct micro-batches")
  }

  test("streaming HLL sketch is batch-split invariant (registers max-merge in state)") {
    import org.apache.spark.sql.streaming.Trigger
    import java.nio.file.attribute.FileTime
    import spark.implicits._
    // the same keys split across micro-batches, with cross-batch repeats —
    // register max-merge in the state store must yield the batch estimate
    def df(rows: Seq[(String, Long)]) = rows.toDF("event_type", "user_id")
    val all = (1L to 40L).map(("a", _)) ++ (1L to 25L).map(("b", _))
    val stage = java.nio.file.Files.createTempDirectory("graft-hll-spec")
    df(all.take(30)).coalesce(1).write.parquet(s"$stage/b0")
    df(all.drop(20)).coalesce(1).write.parquet(s"$stage/b1") // rows 20-29 repeat
    def touch(p: String, t: Long): Unit =
      java.nio.file.Files.walk(java.nio.file.Paths.get(p)).forEach(f =>
        java.nio.file.Files.setLastModifiedTime(f, FileTime.fromMillis(t)))
    val now = System.currentTimeMillis()
    touch(s"$stage/b0", now - 120000); touch(s"$stage/b1", now - 60000)
    val src = spark.readStream
      .schema(spark.read.parquet(s"$stage/b0").schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$stage/b*")
    val q = src
      .groupBy(col("event_type"))
      .agg(round(graft.plans.HllAgg.hllDistinct(col("user_id")), 4).as("u"))
      .writeStream.format("memory").queryName("hll_spec")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val streamed = spark.table("hll_spec").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val batch = df(all)
      .groupBy(col("event_type"))
      .agg(round(graft.plans.HllAgg.hllDistinct(col("user_id")), 4).as("u"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(streamed == batch)
    assert(q.recentProgress.count(_.numInputRows > 0) == 2)
  }
}

class WatermarkSpec extends SparkSpec {
  import spark.implicits._

  test("watermarked append-mode hourly windows emit once closed, late window withheld") {
    import org.apache.spark.sql.streaming.Trigger
    import java.nio.file.attribute.FileTime
    val h = 3600000000L // micros per hour
    val base = 1700000000000000L - (1700000000000000L % h) // aligned to an hour
    def df(rows: Seq[Long]) = rows.zipWithIndex
      .toDF("tsm", "i").select(timestamp_micros(col("tsm")).as("ts"))
    val stage = java.nio.file.Files.createTempDirectory("graft-wm")
    // batch 1: two events in hour 0, one early in hour 1
    df(Seq(base + 60L * 1000000, base + 90L * 1000000, base + h + 300L * 1000000))
      .coalesce(1).write.parquet(s"$stage/b0")
    // batch 2: one event in hour 2 — advances the watermark past hour 1
    df(Seq(base + 2 * h + 1800L * 1000000))
      .coalesce(1).write.parquet(s"$stage/b1")
    def touch(p: String, t: Long): Unit =
      java.nio.file.Files.walk(java.nio.file.Paths.get(p)).forEach(f =>
        java.nio.file.Files.setLastModifiedTime(f, FileTime.fromMillis(t)))
    val now = System.currentTimeMillis()
    touch(s"$stage/b0", now - 120000); touch(s"$stage/b1", now - 60000)
    val src = spark.readStream
      .schema(spark.read.parquet(s"$stage/b0").schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$stage/b*")
    val agg = src
      .withWatermark("ts", "1 minute")
      .groupBy(window(col("ts"), "1 hour"))
      .count()
      .select(col("window.start").cast("long").as("ws"), col("count"))
    val q = agg.writeStream.format("memory").queryName("wm_spec")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("wm_spec").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val h0 = base / 1000000
    // hours 0 and 1 closed (watermark passed their end); hour 2 withheld —
    // append mode only emits finalized windows
    assert(got == Map(h0 -> 2L, (h0 + 3600L) -> 1L), s"got $got")
  }
}

class IndexPersistenceSpec extends SparkSpec {

  test("IVF index parquet round-trip (partitioned by cluster_id) is lossless") {
    val base = Tables
      .embeddings(spark, sf0001)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val queries = Tables
      .embeddings(spark, sf0001)
      .filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val cents = IvfIndex.trainKMeans(spark, base, nlist = 4)
    val index = IvfIndex.build(base, cents)

    val dir = Files.createTempDirectory("graft-index").toString
    index.write.partitionBy("cluster_id").parquet(s"$dir/ivf")
    cents.write.parquet(s"$dir/centroids")

    val index2 = spark.read.parquet(s"$dir/ivf")
    val cents2 = spark.read.parquet(s"$dir/centroids")

    val before = IvfIndex.search(queries, index, cents, 5, nprobe = 2, roundDist = Some(4))
    val after = IvfIndex.search(queries, index2, cents2, 5, nprobe = 2, roundDist = Some(4))
    val a = before.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val b = after.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(a == b)
  }
}

class CapabilitiesSpec extends SparkSpec {
  test("capability tables mirror the reference semantics") {
    assert(Capabilities.supportsMetric("FLAT", "cosine"))
    assert(!Capabilities.supportsMetric("BIN_FLAT", "l2"))
    assert(Capabilities.supportsMetric("SPARSE_WAND", "bm25"))
    assert(Capabilities.hasRawData("IVF_FLAT"))
    // SCANN-style with_raw_data variant: raw vectors retained for rerank
    assert(Capabilities.hasRawData("IVF_SQ8"))
    // HNSW family retains raw vectors (the refine tier — refine-flat
    // configuration), so GetVectorByIds works on every variant
    assert(Capabilities.hasRawData("HNSW_SQ"))
    assert(!Capabilities.hasRawData("NOT_AN_INDEX"))
    assert(Capabilities.supportsConcurrentAppend("IVF_FLAT"))
    assert(!Capabilities.supportsConcurrentAppend("IVF_SQ8"))
    // IsAdditionalScalarSupported: default false; HNSW family true only
    // when the scalar view is mv-ONLY (faiss_hnsw.cc override)
    assert(Capabilities.supportsAdditionalScalar("HNSW", isMvOnly = true))
    assert(Capabilities.supportsAdditionalScalar("HNSW_PRQ", isMvOnly = true))
    assert(!Capabilities.supportsAdditionalScalar("HNSW", isMvOnly = false))
    assert(!Capabilities.supportsAdditionalScalar("IVF_FLAT", isMvOnly = true))
  }
}

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("audio windows: 50% overlap, count = ceil(len/hop), hand-checked energy") {
    val docs = Seq((1L, "x" * 100)).toDF("doc_id", "text")
    val w = operators.Multimodal.windowsFromDocuments(spark, docs).collect()
    assert(w.length == 4) // ceil(100/32) starts: 0, 32, 64, 96
    assert(w.map(_.getAs[Int]("byte_off")).sorted.toSeq == Seq(0, 32, 64, 96))
    // 'x'=120: full window = 64·120² mod 997; tail window (4 bytes) = 4·120² mod 997
    val byOff = w.map(r => r.getAs[Int]("byte_off") -> r.getAs[Long]("energy")).toMap
    assert(byOff(0) == 64L * 120 * 120 % 997)
    assert(byOff(96) == 4L * 120 * 120 % 997)
  }

  test("stub decoder: frame count and checksum are deterministic") {
    val docs = Seq((1L, "a" * 100), (2L, "bc")).toDF("doc_id", "text")
    val m = operators.Multimodal
      .featuresFromDocuments(spark, docs)
      .collect()
      .map(r => (r.getAs[Long]("media_id"), (r.getAs[Int]("n_frames"), r.getAs[Long]("checksum"))))
      .toMap
    // 'a'=97: frame1 = 64*97 mod 997, frame2 = 36*97 mod 997
    assert(m(1L) == ((2, (64 * 97 % 997) + (36 * 97 % 997))))
    assert(m(2L) == ((1, ('b'.toInt + 'c'.toInt) % 997)))
  }

  test("media meta computes byte counts without decoding") {
    val docs = Seq((1L, "hello world")).toDF("doc_id", "text")
    val got = operators.Multimodal.mediaMeta(operators.Multimodal.mediaFromDocuments(docs)).head
    assert(got.getAs[Int]("n_bytes") == 11)
    assert(got.getAs[Int]("n_frames") == 1)
  }
}
