package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.TemporalJoin
import graft.sources.Tables

/** Temporal-join operators over the events table: as-of attribution
  * (purchase ← latest preceding click) and banded interval joins (clicks
  * within a window before each purchase). Timestamps travel as epoch-micro
  * longs end to end, so the oracle compare never touches timestamp
  * internals.
  */
object TemporalQueries {

  def all: Seq[GraftQuery] = Seq(
    // as-of attribution: every purchase joined to the user's LATEST click
    // at-or-before it. Single shuffle on user_id (union + running last) —
    // the plan a 100 TB click/purchase attribution wants: no range
    // explosion, no per-purchase probe. Right side pre-aggregated per
    // (user, ts) so "latest" is well defined.
    GraftQuery(
      "events_asof_join",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val clicks = ev
          .filter(col("event_type") === "click")
          .groupBy(col("user_id"), unix_micros(col("ts")).as("c_us"))
          .agg(max(round(col("value"), 4)).as("click_value"))
        val purch = ev
          .filter(col("event_type") === "purchase")
          .select(
            col("event_id"),
            col("user_id"),
            unix_micros(col("ts")).as("p_us"),
            round(col("value"), 4).as("purchase_value"))
        TemporalJoin
          .asofJoin(
            purch, clicks, Seq("user_id"), "p_us", "c_us",
            payloadCols = Seq("click_value"), matchedTsCol = "click_us")
      },
      Some("""WITH clicks AS (
  SELECT user_id, CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS BIGINT) AS c_us,
         max(round(value, 4)) AS click_value
  FROM events WHERE event_type = 'click' GROUP BY 1, 2
),
purch AS (
  SELECT event_id, user_id, CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS BIGINT) AS p_us,
         round(value, 4) AS purchase_value
  FROM events WHERE event_type = 'purchase'
)
SELECT p.event_id, p.user_id, p.p_us, p.purchase_value, c.c_us AS click_us, c.click_value
FROM purch p ASOF LEFT JOIN clicks c ON p.user_id = c.user_id AND p.p_us >= c.c_us""")),
    // banded interval join: clicks within the 24h BEFORE each purchase,
    // rolled up per purchase (left-outer: zero-click purchases kept). The
    // Spark plan bands both sides at the window width, so each purchase
    // probes ≤2 (user, band) cells — candidates-bounded where the oracle's
    // inequality join is free to nested-loop at sf0.01.
    GraftQuery(
      "events_range_join",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val day = 86400000000L // 24h in micros
        val clicks = ev
          .filter(col("event_type") === "click")
          .select(
            col("user_id"),
            unix_micros(col("ts")).as("c_us"),
            col("value").as("click_value"))
        val purch = ev
          .filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("p_us"))
        val pairs = TemporalJoin
          .rangeJoin(purch, clicks, Seq("user_id"), "p_us", "c_us", -day, 0L)
          .groupBy(col("event_id"))
          .agg(
            count(lit(1)).as("n"),
            sum(round(col("click_value"), 6).cast("decimal(28,6)")).as("v"))
        purch
          .join(pairs, Seq("event_id"), "left")
          .select(
            col("event_id"),
            col("user_id"),
            coalesce(col("n"), lit(0L)).as("n_clicks"),
            round(col("v").cast("double"), 4).as("click_value_sum"))
      },
      Some("""WITH e AS (
  SELECT event_id, user_id, event_type,
         CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS BIGINT) AS us, value
  FROM events
)
SELECT p.event_id, p.user_id,
       count(c.event_id) AS n_clicks,
       round(CAST(sum(CAST(round(c.value, 6) AS DECIMAL(28,6))) AS DOUBLE), 4) AS click_value_sum
FROM e p LEFT JOIN e c
  ON c.event_type = 'click' AND c.user_id = p.user_id
 AND c.us <= p.us AND c.us >= p.us - 86400000000
WHERE p.event_type = 'purchase'
GROUP BY 1, 2""")),
    // the SAME interval join as a STREAM-STREAM JOIN — Spark's native
    // watermarked time-interval join (purchases × clicks, equality on
    // user_id + a two-sided event-time bound): each side's state is
    // retained only inside the watermark-implied window, so at 100 TB/day
    // the join state is bounded by the 24h interval, not the stream
    // history. Inner append-mode pairs hash-match the batch oracle.
    GraftQuery(
      "events_range_join_stream",
      (s, dir) => {
        import org.apache.spark.sql.streaming.Trigger
        val schema = s.read.parquet(s"$dir/events.parquet").schema
        val stage = StreamStage.dir("graft-events-ijoin")
        java.nio.file.Files.copy(
          java.nio.file.Paths.get(s"$dir/events.parquet"),
          stage.resolve("events.parquet"))
        // same nanos-as-long / NTZ → TIMESTAMP normalization as Tables.events
        def src = {
          val raw = s.readStream.schema(schema).parquet(stage.toString)
          schema("ts").dataType match {
            case org.apache.spark.sql.types.LongType =>
              raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
            case org.apache.spark.sql.types.TimestampNTZType =>
              raw.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
            case _ => raw
          }
        }
        val clicks = src
          .filter(col("event_type") === "click")
          .select(
            col("user_id").as("c_user"),
            col("ts").as("c_ts"),
            round(col("value"), 4).as("click_value"))
          .withWatermark("c_ts", "0 seconds")
        val purch = src
          .filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts").as("p_ts"))
          .withWatermark("p_ts", "0 seconds")
        val joined = purch
          .join(
            clicks,
            col("user_id") === col("c_user") &&
              col("c_ts") >= col("p_ts") - expr("INTERVAL 24 HOURS") &&
              col("c_ts") <= col("p_ts"))
          .select(
            col("event_id"),
            col("user_id"),
            unix_micros(col("p_ts")).as("p_us"),
            unix_micros(col("c_ts")).as("c_us"),
            col("click_value"))
        val sink = s"events_range_join_stream_${System.nanoTime()}"
        StreamStage.withStatePartitions(s) {
          val q = joined.writeStream
            .format("memory")
            .queryName(sink)
            .outputMode("append")
            .trigger(Trigger.AvailableNow())
            .start()
          q.awaitTermination()
        }
        s.table(sink)
      },
      Some("""WITH e AS (
  SELECT event_id, user_id, event_type,
         CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS BIGINT) AS us, value
  FROM events
)
SELECT p.event_id, p.user_id, p.us AS p_us, c.us AS c_us,
       round(c.value, 4) AS click_value
FROM e p JOIN e c
  ON c.event_type = 'click' AND c.user_id = p.user_id
 AND c.us <= p.us AND c.us >= p.us - 86400000000
WHERE p.event_type = 'purchase'"""))
  )
}
