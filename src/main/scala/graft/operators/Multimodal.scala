package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing for the training-data pipeline: image/audio/
  * video payloads as opaque BINARY columns with typed metadata, processed in
  * partition-batched imperative code (the Scala analog of `mapInPandas`
  * batch UDFs).
  *
  * The decode step is a DETERMINISTIC FAKE — real image/audio codecs are not
  * in this container. What is real and tested: the schema, the binary
  * payload handling, frame sampling, the partition-batched execution shape,
  * and the feature checksum arithmetic (which the DuckDB oracle reproduces
  * byte-for-byte).
  */
object Multimodal {

  final case class MediaRow(media_id: Long, media: Array[Byte], kind: String)
  final case class MediaFeatures(media_id: Long, n_frames: Int, checksum: Long)

  /** Derive a deterministic media table from documents: payload = UTF-8
    * bytes of the text (stands in for image/audio bytes). */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      col("text").cast("binary").as("media"),
      lit("fake/blob").as("kind"))

  /** Frame metadata (pure SQL — pushed-down, no decode): byte length and
    * fixed-stride frame count. */
  def mediaMeta(media: DataFrame, frameSize: Int = 64): DataFrame =
    media.select(
      col("media_id"),
      length(col("media")).as("n_bytes"),
      ceil(length(col("media")) / lit(frameSize.toDouble)).cast("int").as("n_frames"))

  /** STUB DECODER (deterministic fake): split payload into fixed-size
    * frames; per-frame "feature" = byte sum mod 997; checksum = Σ features.
    * A real decoder (JPEG → pixels, PCM → spectrogram) would replace the
    * body of the map; the partition-batched shape stays identical. */
  def decodeFeatures(ds: Dataset[MediaRow], frameSize: Int = 64)(
      implicit enc: org.apache.spark.sql.Encoder[MediaFeatures]): Dataset[MediaFeatures] =
    ds.mapPartitions { it =>
      it.map { r =>
        val frames = r.media.grouped(frameSize).toArray
        val feats = frames.map(f => f.foldLeft(0L)((a, b) => (a + (b & 0xff)) % 997L))
        MediaFeatures(r.media_id, frames.length, feats.sum)
      }
    }

  /** End-to-end query path: documents → media table → batched decode. */
  def featuresFromDocuments(spark: SparkSession, docs: DataFrame, frameSize: Int = 64): DataFrame = {
    import spark.implicits._
    val media = mediaFromDocuments(docs).as[MediaRow]
    decodeFeatures(media, frameSize).toDF()
  }

  final case class MediaFrame(media_id: Long, frame_idx: Int, byte_off: Int, feature: Long)

  /** Frame SAMPLING (the video frame-sample stage): every `stride`-th
    * fixed-size frame, emitted as one row with its byte offset and the
    * stub per-frame feature (byte sum mod 997). Same partition-batched
    * imperative shape as [[decodeFeatures]]; a real codec would replace
    * the feature computation, the sampling/offset plumbing is real. */
  def sampleFrames(
      ds: Dataset[MediaRow],
      frameSize: Int = 64,
      stride: Int = 3
  )(implicit enc: org.apache.spark.sql.Encoder[MediaFrame]): Dataset[MediaFrame] =
    ds.flatMap { r =>
      val n = (r.media.length + frameSize - 1) / frameSize
      (0 until n by stride).map { f =>
        val off = f * frameSize
        val end = math.min(off + frameSize, r.media.length)
        var s = 0L
        var i = off
        while (i < end) { s = (s + (r.media(i) & 0xff)) % 997L; i += 1 }
        MediaFrame(r.media_id, f, off, s)
      }
    }

  final case class AudioWindow(media_id: Long, win_idx: Int, byte_off: Int, energy: Long)

  /** Audio WINDOWING (the spectrogram-prep stage): overlapping fixed-size
    * windows at `hop` < `window` (50% overlap by default — the standard
    * STFT shape), per-window "energy" = Σ byte² mod 997 as the stub for a
    * real PCM energy/FFT. Same partition-batched imperative shape; a real
    * audio codec would replace the energy body, the hop/overlap/offset
    * plumbing is real. */
  def audioWindows(
      ds: Dataset[MediaRow],
      window: Int = 64,
      hop: Int = 32
  )(implicit enc: org.apache.spark.sql.Encoder[AudioWindow]): Dataset[AudioWindow] =
    ds.flatMap { r =>
      val n = (r.media.length + hop - 1) / hop
      (0 until n).map { w =>
        val off = w * hop
        val end = math.min(off + window, r.media.length)
        var s = 0L
        var i = off
        while (i < end) {
          val b = (r.media(i) & 0xff).toLong
          s = (s + b * b) % 997L
          i += 1
        }
        AudioWindow(r.media_id, w, off, s)
      }
    }

  /** End-to-end audio-window path: documents → media → window rows. */
  def windowsFromDocuments(
      spark: SparkSession,
      docs: DataFrame,
      window: Int = 64,
      hop: Int = 32
  ): DataFrame = {
    import spark.implicits._
    audioWindows(mediaFromDocuments(docs).as[MediaRow], window, hop).toDF()
  }

  /** End-to-end sampled-frame path: documents → media → frame rows. */
  def framesFromDocuments(
      spark: SparkSession,
      docs: DataFrame,
      frameSize: Int = 64,
      stride: Int = 3
  ): DataFrame = {
    import spark.implicits._
    sampleFrames(mediaFromDocuments(docs).as[MediaRow], frameSize, stride).toDF()
  }

  /** Perceptual NEAR-dup over sampled frame features — the media analog of
    * embedding near-dup: two assets are candidates when ≥ `minShared` of
    * their sampled frame features collide (re-encoded/trimmed copies keep
    * most frame features; byte-exact digests catch none of them). Same
    * blocking shape as winnowing pairs: corpus-common features df-capped
    * BEFORE the self-join (a black-frame feature shared by 10⁵ videos
    * would otherwise go quadratic), one feature-keyed shuffle of
    * (media_id, feature) pairs — payloads never move. */
  def nearDupPairs(
      frames: DataFrame, // (media_id, ..., feature)
      minShared: Int = 2,
      maxDf: Int = 50
  ): DataFrame = {
    val fps = frames.select(col("media_id"), col("feature")).distinct()
    val rare = fps
      .groupBy(col("feature"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf)
      .select(col("feature"))
    val pruned = fps.join(rare, Seq("feature"), "left_semi")
    val a = pruned.select(col("media_id").as("media_a"), col("feature"))
    val b = pruned.select(col("media_id").as("media_b"), col("feature"))
    a.join(b, "feature")
      .filter(col("media_a") < col("media_b"))
      .groupBy(col("media_a"), col("media_b"))
      .agg(count(lit(1)).as("shared_frames"))
      .filter(col("shared_frames") >= minShared)
  }
}
