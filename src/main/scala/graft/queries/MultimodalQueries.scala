package graft.queries

import graft.operators.Multimodal
import graft.sources.Tables

/** Multimodal-column plumbing over a deterministic fake payload (text
  * bytes): metadata without decode (pure pushed-down SQL) and the
  * partition-batched stub decoder whose checksum arithmetic the oracle
  * reproduces from character codes (payload is ASCII).
  */
object MultimodalQueries {

  def all: Seq[GraftQuery] = Seq(
    GraftQuery(
      "media_meta",
      (s, dir) => Multimodal.mediaMeta(Multimodal.mediaFromDocuments(Tables.documents(s, dir))),
      Some("""SELECT doc_id AS media_id, CAST(strlen(text) AS INT) AS n_bytes,
CAST(ceil(strlen(text) / 64.0) AS INT) AS n_frames
FROM documents""")),
    GraftQuery(
      "media_features",
      (s, dir) => Multimodal.featuresFromDocuments(s, Tables.documents(s, dir)),
      Some("""SELECT doc_id AS media_id, CAST(ceil(strlen(text) / 64.0) AS INT) AS n_frames,
CAST(list_sum(list_transform(range(0, CAST(ceil(strlen(text) / 64.0) AS BIGINT)), j ->
  list_sum(list_transform(range(1, least(64, strlen(text) - j*64) + 1), i ->
    ascii(substr(text, CAST(j*64 + i AS INT), 1)))) % 997)) AS BIGINT) AS checksum
FROM documents""")),
    // frame sampling: every 3rd fixed-size frame as its own row (offset +
    // stub feature) — the video frame-sample stage's plumbing
    GraftQuery(
      "media_frame_sample",
      (s, dir) => Multimodal.framesFromDocuments(s, Tables.documents(s, dir)),
      Some("""SELECT doc_id AS media_id, CAST(f.range AS INT) AS frame_idx,
CAST(f.range * 64 AS INT) AS byte_off,
CAST(list_sum(list_transform(range(1, least(64, strlen(text) - f.range*64) + 1), i ->
  ascii(substr(text, CAST(f.range*64 + i AS INT), 1)))) % 997 AS BIGINT) AS feature
FROM documents CROSS JOIN range(0, 64) f
WHERE f.range < ceil(strlen(text) / 64.0) AND f.range % 3 = 0""")),
    // perceptual near-dup over sampled frame features (the media analog of
    // embedding near-dup — re-encoded copies share frame features that
    // byte-exact digests miss): df-capped feature blocking, one
    // feature-keyed shuffle, winnowing-pairs shape
    GraftQuery(
      "media_near_dup",
      (s, dir) => Multimodal.nearDupPairs(
        Multimodal.framesFromDocuments(s, Tables.documents(s, dir))),
      Some("""WITH fr AS (
  SELECT doc_id AS media_id,
    CAST(list_sum(list_transform(range(1, least(64, strlen(text) - f.range*64) + 1), i ->
      ascii(substr(text, CAST(f.range*64 + i AS INT), 1)))) % 997 AS BIGINT) AS feature
  FROM documents CROSS JOIN range(0, 64) f
  WHERE f.range < ceil(strlen(text) / 64.0) AND f.range % 3 = 0
),
fps AS (SELECT DISTINCT media_id, feature FROM fr),
rare AS (SELECT feature FROM (SELECT feature, count(*) AS c FROM fps GROUP BY 1) WHERE c <= 50)
SELECT a.media_id AS media_a, b.media_id AS media_b, count(*) AS shared_frames
FROM fps a JOIN rare r ON r.feature = a.feature
JOIN fps b ON b.feature = a.feature AND a.media_id < b.media_id
GROUP BY 1, 2
HAVING count(*) >= 2""")),
    // audio windowing (spectrogram-prep shape): OVERLAPPING 64-byte
    // windows at hop 32 (50% overlap), per-window energy = Σ byte² mod
    // 997 standing in for PCM energy/FFT — the hop/overlap/offset
    // plumbing is the real, tested part
    GraftQuery(
      "media_audio_windows",
      (s, dir) => Multimodal.windowsFromDocuments(s, Tables.documents(s, dir)),
      Some("""SELECT doc_id AS media_id, CAST(w.range AS INT) AS win_idx,
CAST(w.range * 32 AS INT) AS byte_off,
CAST(list_sum(list_transform(range(1, least(64, strlen(text) - w.range*32) + 1), i ->
  ascii(substr(text, CAST(w.range*32 + i AS INT), 1)) *
  ascii(substr(text, CAST(w.range*32 + i AS INT), 1)))) % 997 AS BIGINT) AS energy
FROM documents CROSS JOIN range(0, 32) w
WHERE w.range * 32 < strlen(text)""")),
    // exact dedup over the OPAQUE BINARY payload (the image/audio shape —
    // identical bytes, any modality): one shuffle on the 16-byte digest,
    // payloads never move
    GraftQuery(
      "media_dedup",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        import org.apache.spark.sql.functions._
        val media = Multimodal.mediaFromDocuments(Tables.documents(s, dir))
        val w = Window.partitionBy(md5(col("media")))
        media.select(
          col("media_id"),
          when(col("media_id") === min(col("media_id")).over(w), 1).otherwise(0).as("keep"),
          count(lit(1)).over(w).cast("int").as("n_copies"))
      },
      Some("""SELECT doc_id AS media_id,
CASE WHEN doc_id = min(doc_id) OVER (PARTITION BY md5(text)) THEN 1 ELSE 0 END AS keep,
CAST(count(*) OVER (PARTITION BY md5(text)) AS INT) AS n_copies
FROM documents"""))
  )
}
