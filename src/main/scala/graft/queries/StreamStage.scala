package graft.queries

import java.nio.file.{Files, Path}
import java.nio.file.attribute.FileTime

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared staging for the STREAMING TWIN queries: each twin replays a batch
  * table as ordered micro-batches through a file source. Centralised here
  * because the per-site copies had two real defects (round-5 advice):
  * the temp parquet copies were never deleted (bench/verify run dozens of
  * twins per JVM — repeated runs leaked disk), and batch order hung on
  * 60 s-apart mtimes, which a coarse-mtime filesystem could reorder.
  */
private[graft] object StreamStage {

  private val registered = new java.util.concurrent.ConcurrentLinkedQueue[Path]
  private lazy val hookInstalled: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      registered.forEach { p =>
        try
          Files.walk(p).sorted(java.util.Comparator.reverseOrder()).forEach { f =>
            try Files.deleteIfExists(f)
            catch { case _: Throwable => () }
          }
        catch { case _: Throwable => () }
      }))

  /** Temp dir registered for recursive deletion at JVM exit. */
  def dir(prefix: String): Path = {
    hookInstalled
    val p = Files.createTempDirectory(prefix)
    registered.add(p)
    p
  }

  /** Run a streaming twin's start→awaitTermination block with
    * `spark.sql.shuffle.partitions` sized for STATE, not for the local
    * core count. A stream fixes its state-partition count from this conf
    * at first-batch planning and every micro-batch then touches every
    * state partition (delta + metadata files per store per batch) — the
    * r13 driver runs measured events_range_join_stream 1.5× FASTER at 8
    * cores than 32 purely because state partitions tracked `local[n]`.
    * State-partition count should track state volume; the twins' per-rep
    * state is tiny, so the default caps at 8 (env-overridable
    * GRAFT_STREAM_SHUFFLE_PARTITIONS for deployments with real state).
    * Partitioning never changes aggregation/join results — the twins stay
    * hash-equal to their batch oracles. The conf is restored after the
    * block; batch queries keep the session's cpus-sized partitioning. */
  def withStatePartitions[T](spark: SparkSession)(body: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val old = spark.conf.get(key)
    val n = sys.env.getOrElse(
      "GRAFT_STREAM_SHUFFLE_PARTITIONS",
      math.min(scala.util.Try(old.toInt).getOrElse(8), 8).toString)
    spark.conf.set(key, n)
    try body
    finally spark.conf.set(key, old)
  }

  private def touch(p: Path, t: Long): Unit =
    Files.walk(p).forEach(f => Files.setLastModifiedTime(f, FileTime.fromMillis(t)))

  /** Write `batches` as single-file parquet dirs b0..bn-1 (one file per
    * batch: a micro-batch must arrive as ONE file) with mtimes spaced 10
    * MINUTES apart oldest-first — far beyond any filesystem's mtime
    * granularity, so the file source's modification-time ordering replays
    * the batches in the given order; returns the streaming source frame
    * (one file per trigger). */
  def stagedSource(
      spark: SparkSession,
      batches: Seq[DataFrame],
      prefix: String
  ): DataFrame = {
    require(batches.nonEmpty, "at least one batch")
    val stage = dir(prefix)
    val now = System.currentTimeMillis()
    batches.zipWithIndex.foreach { case (b, i) =>
      val d = stage.resolve(s"b$i")
      b.coalesce(1).write.mode("overwrite").parquet(d.toString)
      touch(d, now - (batches.length - i).toLong * 600000L)
    }
    spark.readStream
      .schema(spark.read.parquet(stage.resolve("b0").toString).schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$stage/b*")
  }
}
