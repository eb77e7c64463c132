package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.SparseSearch
import graft.sources.Tables

/** Training-data pipeline analytics: vocabulary building, event
  * sessionization, distribution statistics — all over the scale tables.
  */
object PipelineQueries {

  def all: Seq[GraftQuery] = Seq(
    // vocabulary building: document frequency + total tf, top 20 terms
    GraftQuery(
      "vocab_top_terms",
      (s, dir) => {
        val stats = SparseSearch
          .postings(Tables.documents(s, dir), "doc_id", "text")
          .groupBy(col("term"))
          .agg(count(lit(1)).as("df"), sum(col("tf")).as("total_tf"))
        // orderBy().limit() → TakeOrderedAndProject: per-partition top-20 +
        // driver merge, never a single-partition sort of the whole
        // vocabulary (a global Window.orderBy here would be exactly that).
        // Rank is recovered over the 20 survivors with a broadcast
        // precedence self-join — no window at any scale.
        val top = stats.orderBy(col("total_tf").desc, col("term").asc).limit(20)
        val prior = top.select(col("term").as("t2"), col("total_tf").as("tt2"))
        top
          .join(
            broadcast(prior),
            col("tt2") > col("total_tf") ||
              (col("tt2") === col("total_tf") && col("t2") < col("term")),
            "left")
          .groupBy(col("term"), col("df"), col("total_tf"))
          .agg((count(col("t2")) + 1).cast("int").as("rnk"))
      },
      Some("""WITH tf AS (
  SELECT doc_id, term, count(*) AS tf
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
  GROUP BY 1, 2
),
stats AS (SELECT term, count(*) AS df, sum(tf) AS total_tf FROM tf GROUP BY 1)
SELECT term, df, CAST(total_tf AS BIGINT) AS total_tf, rnk FROM (
  SELECT term, df, total_tf,
         CAST(row_number() OVER (ORDER BY total_tf DESC, term ASC) AS INT) AS rnk
  FROM stats
) WHERE rnk <= 20""")),
    // gap-based sessionization (30-min gap), deterministic order (ts, id);
    // timestamps compared in integral microseconds
    GraftQuery(
      "events_sessions",
      (s, dir) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        val prev = lag(col("ts"), 1).over(w)
        val newSess = when(prev.isNull, 0L)
          .otherwise(when(unix_micros(col("ts")) - unix_micros(prev) > 1800000000L, 1L).otherwise(0L))
        Tables
          .events(s, dir)
          .withColumn("ns", newSess)
          .groupBy(col("user_id"))
          .agg((sum(col("ns")) + 1L).cast("int").as("n_sessions"), count(lit(1)).as("n_events"))
      },
      Some("""WITH o AS (
  SELECT user_id, event_id, ts,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events
)
SELECT user_id,
  CAST(sum(CASE WHEN prev IS NULL THEN 0
                WHEN epoch_us(CAST(ts AS TIMESTAMP)) - epoch_us(CAST(prev AS TIMESTAMP)) > 1800000000 THEN 1
                ELSE 0 END) + 1 AS INT) AS n_sessions,
  count(*) AS n_events
FROM o GROUP BY 1""")),
    // the SAME sessionization as a STATEFUL STREAMING computation
    // (mapGroupsWithState): the events table is time-split into two files
    // consumed as separate micro-batches; per-user GroupState carries
    // (last ts, counts) across the boundary, so sessions spanning batches
    // are not double-counted — the hash match against the batch oracle
    // gates the cross-batch state handling
    GraftQuery(
      "events_sessions_stream",
      (s, dir) => {
        import org.apache.spark.sql.streaming.Trigger
        val ev = Tables.events(s, dir)
        val median = ev.selectExpr("percentile(unix_micros(ts), 0.5)").head().getDouble(0).toLong
        // one part file per half (a micro-batch must hold a time-aligned
        // slice per user), staged + mtime-ordered by StreamStage
        val src = StreamStage.stagedSource(s, Seq(
          ev.filter(unix_micros(col("ts")) <= median),
          ev.filter(unix_micros(col("ts")) > median)), "graft-sess-stream")
        val sink = s"events_sessions_stream_${System.nanoTime()}"
        StreamStage.withStatePartitions(s) {
          val q = graft.streaming.StreamingSessions
            .sessionUpdates(src, gapMicros = 1800000000L)
            .writeStream
            .format("memory")
            .queryName(sink)
            .outputMode("update")
            .trigger(Trigger.AvailableNow())
            .start()
          q.awaitTermination()
        }
        // running totals are monotone → final state per user is the max
        s.table(sink)
          .groupBy(col("user_id"))
          .agg(max(col("n_sessions")).cast("int").as("n_sessions"),
            max(col("n_events")).as("n_events"))
      },
      Some("""WITH o AS (
  SELECT user_id, event_id, ts,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events
)
SELECT user_id,
  CAST(sum(CASE WHEN prev IS NULL THEN 0
                WHEN epoch_us(CAST(ts AS TIMESTAMP)) - epoch_us(CAST(prev AS TIMESTAMP)) > 1800000000 THEN 1
                ELSE 0 END) + 1 AS INT) AS n_sessions,
  count(*) AS n_events
FROM o GROUP BY 1""")),
    // the SAME 30-min-gap sessions through Spark's NATIVE session_window
    // operator (the built-in the mapGroupsWithState twin hand-rolls):
    // per-session rows with start/end/count/value — merging is Catalyst's,
    // the oracle restates it with the lag/cumsum session-id derivation
    GraftQuery(
      "events_session_window",
      (s, dir) =>
        Tables
          .events(s, dir)
          .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
          .agg(
            count(lit(1)).as("n_events"),
            round(
              sum(round(col("value"), 6).cast("decimal(28,6)")).cast("double"),
              4).as("value_sum"))
          .select(
            col("user_id"),
            unix_micros(col("sw.start")).as("start_us"),
            unix_micros(col("sw.end")).as("end_us"),
            col("n_events"),
            col("value_sum")),
      Some("""WITH o AS (
  SELECT user_id, event_id, value,
         CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS BIGINT) AS us,
         lag(CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS BIGINT))
           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events
),
sid AS (
  SELECT user_id, us, value,
    sum(CASE WHEN prev IS NULL OR us - prev > 1800000000 THEN 1 ELSE 0 END)
      OVER (PARTITION BY user_id ORDER BY us, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM o
)
SELECT user_id, min(us) AS start_us, max(us) + 1800000000 AS end_us,
  count(*) AS n_events,
  round(CAST(sum(CAST(round(value, 6) AS DECIMAL(28,6))) AS DOUBLE), 4) AS value_sum
FROM sid GROUP BY user_id, sid""")),
    // the native session_window through Structured Streaming (complete
    // mode: every session re-emits as batches arrive, so no watermark
    // race can drop the stream-tail sessions) — hash-matches the batch
    // session oracle above
    GraftQuery(
      "events_session_window_stream",
      (s, dir) => {
        import org.apache.spark.sql.streaming.Trigger
        val schema = s.read.parquet(s"$dir/events.parquet").schema
        val stage = StreamStage.dir("graft-sesswin-stream")
        java.nio.file.Files.copy(
          java.nio.file.Paths.get(s"$dir/events.parquet"),
          stage.resolve("events.parquet"))
        val raw = s.readStream.schema(schema).parquet(stage.toString)
        val ev = raw.schema("ts").dataType match {
          case org.apache.spark.sql.types.LongType =>
            raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
          case org.apache.spark.sql.types.TimestampNTZType =>
            raw.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
          case _ => raw
        }
        val sink = s"events_session_window_stream_${System.nanoTime()}"
        StreamStage.withStatePartitions(s) {
          val q = ev
            .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
            .agg(
              count(lit(1)).as("n_events"),
              round(
                sum(round(col("value"), 6).cast("decimal(28,6)")).cast("double"),
                4).as("value_sum"))
            .select(
              col("user_id"),
              unix_micros(col("sw.start")).as("start_us"),
              unix_micros(col("sw.end")).as("end_us"),
              col("n_events"),
              col("value_sum"))
            .writeStream
            .format("memory")
            .queryName(sink)
            .outputMode("complete")
            .trigger(Trigger.AvailableNow())
            .start()
          q.awaitTermination()
        }
        s.table(sink)
      },
      Some("""WITH o AS (
  SELECT user_id, event_id, value,
         CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS BIGINT) AS us,
         lag(CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS BIGINT))
           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events
),
sid AS (
  SELECT user_id, us, value,
    sum(CASE WHEN prev IS NULL OR us - prev > 1800000000 THEN 1 ELSE 0 END)
      OVER (PARTITION BY user_id ORDER BY us, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM o
)
SELECT user_id, min(us) AS start_us, max(us) + 1800000000 AS end_us,
  count(*) AS n_events,
  round(CAST(sum(CAST(round(value, 6) AS DECIMAL(28,6))) AS DOUBLE), 4) AS value_sum
FROM sid GROUP BY user_id, sid""")),
    // LAST-touch attribution as a STATEFUL STREAM: state is ONE latest
    // touch per user (the as-of right side never accumulates); batch rows
    // replay in (ts, touches-first, id) order so same-instant touches are
    // visible to the inclusive bound — hash-matches the batch oracle
    GraftQuery(
      "events_attribution_last_stream",
      (s, dir) => {
        import org.apache.spark.sql.streaming.Trigger
        val ev = Tables.events(s, dir)
        val median = ev.selectExpr("percentile(unix_micros(ts), 0.5)").head().getDouble(0).toLong
        val src = StreamStage.stagedSource(s, Seq(
          ev.filter(unix_micros(col("ts")) <= median),
          ev.filter(unix_micros(col("ts")) > median)), "graft-attrl-stream")
        val sink = s"events_attr_last_stream_${System.nanoTime()}"
        StreamStage.withStatePartitions(s) {
          val q = graft.streaming.StreamingCohort
            .lastTouchUpdates(src)
            .writeStream
            .format("memory")
            .queryName(sink)
            .outputMode("update")
            .trigger(Trigger.AvailableNow())
            .start()
          q.awaitTermination()
        }
        graft.streaming.StreamingCohort.renderAttribution(s.table(sink))
      },
      Some("""WITH t AS (
  SELECT user_id, CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS BIGINT) AS us,
         arg_max(event_type, event_id) AS touch_type
  FROM events WHERE event_type IN ('view', 'click') GROUP BY 1, 2
),
p AS (
  SELECT event_id AS conv_id, user_id, CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS BIGINT) AS p_us,
         round(value, 4) AS conv_value
  FROM events WHERE event_type = 'purchase'
),
m AS (
  SELECT p.conv_id, p.conv_value, t.touch_type,
         row_number() OVER (PARTITION BY p.conv_id ORDER BY t.us DESC) AS rn
  FROM p LEFT JOIN t ON t.user_id = p.user_id AND t.us <= p.p_us
)
SELECT channel, count(*) AS conversions,
       round(CAST(sum(CAST(conv_value AS DECIMAL(28,4))) AS DOUBLE), 4) AS revenue
FROM (SELECT conv_id, conv_value, coalesce(touch_type, 'none') AS channel
      FROM m WHERE rn = 1)
GROUP BY 1""")),
    // time-DECAYED revenue per user (the recency-weighted LTV feature):
    // weight = 2^(−days_ago/7) in ppm, the decay table computed ONCE in
    // Scala and embedded as literals in BOTH engines (the dcgDiscounts
    // device — libm pow can never split them); Σ value·decay stays exact
    // 64-bit integers (4dp-scaled value × ppm weight)
    GraftQuery(
      "events_decayed_revenue",
      (s, dir) => {
        val horizon = 64
        val decay = (0 until horizon).map(d =>
          math.floor(1e6 * math.pow(0.5, d / 7.0)).toLong)
        val ev = Tables.events(s, dir).filter(col("event_type") === "purchase")
        val maxDay = ev.agg(max(datediff(to_date(col("ts")), to_date(lit("1970-01-01"))))).head.getInt(0)
        val daysAgo = lit(maxDay) - datediff(to_date(col("ts")), to_date(lit("1970-01-01")))
        val w = when(daysAgo < horizon,
          element_at(array(decay.map(lit): _*), (daysAgo + 1).cast("int")))
          .otherwise(lit(0L))
        // value 4dp-scaled to an exact long × ppm decay: the whole sum is
        // exact 64-bit integers (≈2·10¹² per row), no engine can disagree
        val vi = (round(col("value"), 4).cast("decimal(18,4)") * 10000).cast("long")
        ev.select(col("user_id"), (vi * w).as("_dw"))
          .groupBy(col("user_id"))
          .agg(sum(col("_dw")).as("decayed_e10"))
      },
      Some({
        val horizon = 64
        val decay = (0 until horizon).map(d =>
          math.floor(1e6 * math.pow(0.5, d / 7.0)).toLong)
        val arr = decay.mkString("[", ", ", "]")
        s"""WITH p AS (
  SELECT user_id, round(value, 4) AS v,
    CAST(date_diff('day', DATE '1970-01-01', CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS INT) AS day
  FROM events WHERE event_type = 'purchase'
),
mx AS (SELECT max(day) AS m FROM p),
w AS (
  SELECT user_id,
    CAST(CAST(v AS DECIMAL(18,4)) * 10000 AS BIGINT) * (CASE WHEN (mx.m - day) < $horizon
      THEN ($arr)[mx.m - day + 1] ELSE 0 END) AS dw
  FROM p CROSS JOIN mx
)
SELECT user_id, CAST(sum(dw) AS BIGINT) AS decayed_e10
FROM w GROUP BY 1"""
      })),
    // event-type TRANSITION matrix (the first-order Markov view of user
    // journeys): per user, consecutive event pairs ordered by (ts, id),
    // counted per (from, to) — per-user windows over per-user event
    // counts, one tiny (from, to) roll-up
    GraftQuery(
      "events_transitions",
      (s, dir) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        Tables
          .events(s, dir)
          .withColumn("_next", lead(col("event_type"), 1).over(w))
          .filter(col("_next").isNotNull)
          .groupBy(col("event_type").as("from_type"), col("_next").as("to_type"))
          .agg(count(lit(1)).as("n"))
      },
      Some("""WITH o AS (
  SELECT user_id, event_type,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
  FROM events
)
SELECT event_type AS from_type, nxt AS to_type, count(*) AS n
FROM o WHERE nxt IS NOT NULL GROUP BY 1, 2""")),
    // top spenders: the bounded leaderboard (TakeOrderedAndProject + the
    // broadcast precedence self-join for ranks — never a global window);
    // revenue under the round→DECIMAL-sum contract
    GraftQuery(
      "events_top_spenders",
      (s, dir) => {
        val rev = Tables
          .events(s, dir)
          .filter(col("event_type") === "purchase")
          .groupBy(col("user_id"))
          .agg(
            count(lit(1)).as("n_purchases"),
            round(
              sum(round(col("value"), 6).cast("decimal(28,6)")).cast("double"),
              4).as("revenue"))
        val top = rev.orderBy(col("revenue").desc, col("user_id").asc).limit(20)
        val prior = top.select(col("user_id").as("u2"), col("revenue").as("r2"))
        top
          .join(
            broadcast(prior),
            col("r2") > col("revenue") ||
              (col("r2") === col("revenue") && col("u2") < col("user_id")),
            "left")
          .groupBy(col("user_id"), col("n_purchases"), col("revenue"))
          .agg((count(col("u2")) + 1).cast("int").as("rnk"))
      },
      Some("""WITH rev AS (
  SELECT user_id, count(*) AS n_purchases,
         round(CAST(sum(CAST(round(value, 6) AS DECIMAL(28,6))) AS DOUBLE), 4) AS revenue
  FROM events WHERE event_type = 'purchase' GROUP BY 1
)
SELECT user_id, n_purchases, revenue, rnk FROM (
  SELECT user_id, n_purchases, revenue,
         CAST(row_number() OVER (ORDER BY revenue DESC, user_id ASC) AS INT) AS rnk
  FROM rev
) WHERE rnk <= 20""")),
    // SALTED hot-key join (the third skew tool next to broadcast and AQE
    // skew-split): the per-user dim replicates 8×, each event lands in one
    // deterministic salt bucket, so a power-law user spreads over 8
    // reducers instead of one. The oracle states the PLAIN join — salting
    // must be invisible in the result
    GraftQuery(
      "events_salted_join",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val userDim = ev.groupBy(col("user_id")).agg(count(lit(1)).as("user_total"))
        graft.operators.Skew
          .saltedJoin(
            ev.select(col("event_id"), col("user_id"), col("event_type")),
            userDim, "user_id", discriminator = col("event_id"), salts = 8)
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"), sum(col("user_total")).as("sum_user_total"))
      },
      Some("""WITH u AS (SELECT user_id, count(*) AS user_total FROM events GROUP BY 1)
SELECT e.event_type, count(*) AS n, CAST(sum(u.user_total) AS BIGINT) AS sum_user_total
FROM events e JOIN u ON u.user_id = e.user_id
GROUP BY 1""")),
    // exact interpolated percentiles per event type
    GraftQuery(
      "events_quantiles",
      (s, dir) =>
        Tables
          .events(s, dir)
          .groupBy(col("event_type"))
          .agg(
            round(expr("percentile(value, 0.5)"), 4).as("p50"),
            round(expr("percentile(value, 0.95)"), 4).as("p95")),
      Some("""SELECT event_type, round(quantile_cont(value, 0.5), 4) AS p50,
round(quantile_cont(value, 0.95), 4) AS p95
FROM events GROUP BY 1""")),
    // strict-ordering conversion funnel (view → click → purchase): step i
    // counts users whose first step-i event follows their first qualifying
    // step-(i−1) event; conversion = integer bp off step 1. Every shuffle
    // keys on user_id; per-step frames shrink monotonically
    GraftQuery(
      "events_time_to_convert",
      (s, dir) => {
        // time-to-convert per user: first purchase at-or-after the first
        // view, delta in exact integer microseconds. Every aggregate and
        // the join key on user_id — the single-shuffle family at 100 TB
        val ev = Tables.events(s, dir)
        val v0 = ev
          .filter(col("event_type") === "view")
          .groupBy(col("user_id"))
          .agg(min(unix_micros(col("ts"))).as("v0"))
        val p = ev
          .filter(col("event_type") === "purchase")
          .select(col("user_id"), unix_micros(col("ts")).as("pt"))
        v0.join(p, "user_id")
          .filter(col("pt") >= col("v0"))
          .groupBy(col("user_id"), col("v0"))
          .agg(min(col("pt")).as("p0"))
          .select(col("user_id"), (col("p0") - col("v0")).as("convert_us"))
      },
      Some("""WITH v AS (
  SELECT user_id, min(epoch_us(CAST(ts AS TIMESTAMP))) AS v0
  FROM events WHERE event_type = 'view' GROUP BY 1
),
p AS (
  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS pt
  FROM events WHERE event_type = 'purchase'
)
SELECT v.user_id AS user_id, min(p.pt) - v.v0 AS convert_us
FROM v JOIN p ON p.user_id = v.user_id AND p.pt >= v.v0
GROUP BY v.user_id, v.v0""")),
    // time-to-convert as a STATEFUL STREAM: per-user GroupState pins the
    // first view and the first qualifying purchase across time-aligned
    // micro-batches; each converting user emits exactly once, so the
    // update stream IS the batch result — hash-matches the batch oracle
    GraftQuery(
      "events_time_to_convert_stream",
      (s, dir) => {
        import org.apache.spark.sql.streaming.Trigger
        val ev = Tables.events(s, dir)
        val median = ev.selectExpr("percentile(unix_micros(ts), 0.5)").head().getDouble(0).toLong
        val src = StreamStage.stagedSource(s, Seq(
          ev.filter(unix_micros(col("ts")) <= median),
          ev.filter(unix_micros(col("ts")) > median)), "graft-ttc-stream")
        val sink = s"events_ttc_stream_${System.nanoTime()}"
        StreamStage.withStatePartitions(s) {
          val q = graft.streaming.StreamingCohort
            .timeToConvertUpdates(src)
            .writeStream
            .format("memory")
            .queryName(sink)
            .outputMode("update")
            .trigger(Trigger.AvailableNow())
            .start()
          q.awaitTermination()
        }
        s.table(sink)
      },
      Some("""WITH v AS (
  SELECT user_id, min(epoch_us(CAST(ts AS TIMESTAMP))) AS v0
  FROM events WHERE event_type = 'view' GROUP BY 1
),
p AS (
  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS pt
  FROM events WHERE event_type = 'purchase'
)
SELECT v.user_id AS user_id, min(p.pt) - v.v0 AS convert_us
FROM v JOIN p ON p.user_id = v.user_id AND p.pt >= v.v0
GROUP BY v.user_id, v.v0""")),
    // three-step funnel over the events table
    GraftQuery(
      "events_funnel",
      (s, dir) =>
        graft.operators.Funnel.steps(
          Tables.events(s, dir), Seq("view", "click", "purchase")),
      Some("""WITH s1 AS (
  SELECT user_id, min(ts) AS t FROM events WHERE event_type = 'view' GROUP BY 1
),
s2 AS (
  SELECT e.user_id, min(e.ts) AS t FROM events e JOIN s1 ON s1.user_id = e.user_id
  WHERE e.event_type = 'click' AND e.ts > s1.t GROUP BY 1
),
s3 AS (
  SELECT e.user_id, min(e.ts) AS t FROM events e JOIN s2 ON s2.user_id = e.user_id
  WHERE e.event_type = 'purchase' AND e.ts > s2.t GROUP BY 1
),
c AS (
  SELECT 'view' AS step, 1 AS step_ord, count(*) AS users FROM s1
  UNION ALL SELECT 'click', 2, count(*) FROM s2
  UNION ALL SELECT 'purchase', 3, count(*) FROM s3
),
b AS (SELECT users AS base FROM c WHERE step_ord = 1)
SELECT step, step_ord, users, CAST(users * 10000 // base AS BIGINT) AS conv_bp
FROM c CROSS JOIN b""")),
    // the funnel as a STATEFUL STREAM (per-user GroupState carries the
    // first qualifying ts per step; time-aligned micro-batches, the
    // sessions-stream contract) — hash-matches the batch oracle
    GraftQuery(
      "events_funnel_stream",
      (s, dir) => {
        import org.apache.spark.sql.streaming.Trigger
        val ev = Tables.events(s, dir)
        val median = ev.selectExpr("percentile(unix_micros(ts), 0.5)").head().getDouble(0).toLong
        val src = StreamStage.stagedSource(s, Seq(
          ev.filter(unix_micros(col("ts")) <= median),
          ev.filter(unix_micros(col("ts")) > median)), "graft-funnel-stream")
        val steps = Seq("view", "click", "purchase")
        val sink = s"events_funnel_stream_${System.nanoTime()}"
        StreamStage.withStatePartitions(s) {
          val q = graft.streaming.StreamingFunnel
            .funnelUpdates(src, steps)
            .writeStream
            .format("memory")
            .queryName(sink)
            .outputMode("update")
            .trigger(Trigger.AvailableNow())
            .start()
          q.awaitTermination()
        }
        graft.streaming.StreamingFunnel.renderFinal(s.table(sink), steps)
      },
      Some("""WITH s1 AS (
  SELECT user_id, min(ts) AS t FROM events WHERE event_type = 'view' GROUP BY 1
),
s2 AS (
  SELECT e.user_id, min(e.ts) AS t FROM events e JOIN s1 ON s1.user_id = e.user_id
  WHERE e.event_type = 'click' AND e.ts > s1.t GROUP BY 1
),
s3 AS (
  SELECT e.user_id, min(e.ts) AS t FROM events e JOIN s2 ON s2.user_id = e.user_id
  WHERE e.event_type = 'purchase' AND e.ts > s2.t GROUP BY 1
),
c AS (
  SELECT 'view' AS step, 1 AS step_ord, count(*) AS users FROM s1
  UNION ALL SELECT 'click', 2, count(*) FROM s2
  UNION ALL SELECT 'purchase', 3, count(*) FROM s3
),
b AS (SELECT users AS base FROM c WHERE step_ord = 1)
SELECT step, step_ord, users, CAST(users * 10000 // base AS BIGINT) AS conv_bp
FROM c CROSS JOIN b""")),
    // robust outlier detection (median + MAD, the classic data-quality
    // gate): flag events whose |value − median| exceeds 3×MAD of their
    // event type. Exact interpolated medians (same percentile contract
    // events_quantiles gates); per-type stats broadcast back onto the
    // stream — at 100 TB the exact arm's per-type value collection is the
    // known hot spot, and HistogramQuantileAgg (events_sketch_quantiles)
    // is the sketch-based scale path for the same dashboard
    // day-N retention by first-active-day cohort: the dashboard next to the
    // funnel. Days travel as integer days-since-epoch, shares as integer bp.
    // Two user-keyed shuffles + one tiny (cohort, offset) roll-up; cohort
    // sizes (≤ nDays rows) broadcast back
    GraftQuery(
      "events_retention",
      (s, dir) => graft.operators.Cohort.retention(Tables.events(s, dir)),
      Some("""WITH d AS (
  SELECT user_id, CAST(date_diff('day', DATE '1970-01-01', CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS INT) AS day
  FROM events
),
c AS (SELECT user_id, min(day) AS cohort_day FROM d GROUP BY 1),
s AS (SELECT cohort_day, count(*) AS cohort_users FROM c GROUP BY 1),
a AS (SELECT DISTINCT d.user_id, c.cohort_day, d.day - c.cohort_day AS day_offset
      FROM d JOIN c ON c.user_id = d.user_id)
SELECT a.cohort_day, a.day_offset, count(*) AS active_users, s.cohort_users,
       CAST(count(*) * 10000 // s.cohort_users AS BIGINT) AS retained_bp
FROM a JOIN s ON s.cohort_day = a.cohort_day
GROUP BY 1, 2, 4""")),
    // the retention matrix as a STATEFUL STREAM: per-user GroupState
    // carries (cohort day, credited offsets); micro-batches emit only
    // novel activity cells, so the accumulated update stream equals the
    // batch op's distinct cell frame — hash-matches the batch oracle
    GraftQuery(
      "events_retention_stream",
      (s, dir) => {
        import org.apache.spark.sql.streaming.Trigger
        val ev = Tables.events(s, dir)
        val median = ev.selectExpr("percentile(unix_micros(ts), 0.5)").head().getDouble(0).toLong
        val src = StreamStage.stagedSource(s, Seq(
          ev.filter(unix_micros(col("ts")) <= median),
          ev.filter(unix_micros(col("ts")) > median)), "graft-ret-stream")
        val sink = s"events_retention_stream_${System.nanoTime()}"
        StreamStage.withStatePartitions(s) {
          val q = graft.streaming.StreamingCohort
            .retentionUpdates(src)
            .writeStream
            .format("memory")
            .queryName(sink)
            .outputMode("update")
            .trigger(Trigger.AvailableNow())
            .start()
          q.awaitTermination()
        }
        graft.streaming.StreamingCohort.renderFinal(s.table(sink))
      },
      Some("""WITH d AS (
  SELECT user_id, CAST(date_diff('day', DATE '1970-01-01', CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS INT) AS day
  FROM events
),
c AS (SELECT user_id, min(day) AS cohort_day FROM d GROUP BY 1),
s AS (SELECT cohort_day, count(*) AS cohort_users FROM c GROUP BY 1),
a AS (SELECT DISTINCT d.user_id, c.cohort_day, d.day - c.cohort_day AS day_offset
      FROM d JOIN c ON c.user_id = d.user_id)
SELECT a.cohort_day, a.day_offset, count(*) AS active_users, s.cohort_users,
       CAST(count(*) * 10000 // s.cohort_users AS BIGINT) AS retained_bp
FROM a JOIN s ON s.cohort_day = a.cohort_day
GROUP BY 1, 2, 4""")),
    // FIRST-touch attribution (acquisition view): each purchase credits the
    // user's globally earliest view/click at-or-before it, else 'none'.
    // One row per user rides the join; revenue follows the round→DECIMAL
    // sum contract
    GraftQuery(
      "events_attribution_first",
      (s, dir) => graft.operators.Cohort.attribution(
        Tables.events(s, dir), "purchase", Seq("view", "click"), first = true),
      Some("""WITH t AS (
  SELECT user_id, CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS BIGINT) AS us, event_id, event_type
  FROM events WHERE event_type IN ('view', 'click')
),
ft AS (
  SELECT user_id, us, event_type FROM (
    SELECT user_id, us, event_type,
           row_number() OVER (PARTITION BY user_id ORDER BY us, event_id, event_type) AS rn
    FROM t) WHERE rn = 1
),
p AS (
  SELECT event_id AS conv_id, user_id, CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS BIGINT) AS p_us,
         round(value, 4) AS conv_value
  FROM events WHERE event_type = 'purchase'
),
cr AS (
  SELECT p.conv_id, p.conv_value,
         CASE WHEN ft.us IS NOT NULL AND ft.us <= p.p_us THEN ft.event_type
              ELSE 'none' END AS channel
  FROM p LEFT JOIN ft ON ft.user_id = p.user_id
)
SELECT channel, count(*) AS conversions,
       round(CAST(sum(CAST(conv_value AS DECIMAL(28,4))) AS DOUBLE), 4) AS revenue
FROM cr GROUP BY 1""")),
    // FIRST-touch attribution as a STATEFUL STREAM: per-user GroupState
    // carries the earliest touch (min-struct order = the batch op's);
    // purchases credit on arrival — time-aligned batches make the greedy
    // credit exact, so the render hash-matches the batch oracle
    GraftQuery(
      "events_attribution_first_stream",
      (s, dir) => {
        import org.apache.spark.sql.streaming.Trigger
        val ev = Tables.events(s, dir)
        val median = ev.selectExpr("percentile(unix_micros(ts), 0.5)").head().getDouble(0).toLong
        val src = StreamStage.stagedSource(s, Seq(
          ev.filter(unix_micros(col("ts")) <= median),
          ev.filter(unix_micros(col("ts")) > median)), "graft-attr-stream")
        val sink = s"events_attr_first_stream_${System.nanoTime()}"
        StreamStage.withStatePartitions(s) {
          val q = graft.streaming.StreamingCohort
            .firstTouchUpdates(src)
            .writeStream
            .format("memory")
            .queryName(sink)
            .outputMode("update")
            .trigger(Trigger.AvailableNow())
            .start()
          q.awaitTermination()
        }
        graft.streaming.StreamingCohort.renderAttribution(s.table(sink))
      },
      Some("""WITH t AS (
  SELECT user_id, CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS BIGINT) AS us, event_id, event_type
  FROM events WHERE event_type IN ('view', 'click')
),
ft AS (
  SELECT user_id, us, event_type FROM (
    SELECT user_id, us, event_type,
           row_number() OVER (PARTITION BY user_id ORDER BY us, event_id, event_type) AS rn
    FROM t) WHERE rn = 1
),
p AS (
  SELECT event_id AS conv_id, user_id, CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS BIGINT) AS p_us,
         round(value, 4) AS conv_value
  FROM events WHERE event_type = 'purchase'
),
cr AS (
  SELECT p.conv_id, p.conv_value,
         CASE WHEN ft.us IS NOT NULL AND ft.us <= p.p_us THEN ft.event_type
              ELSE 'none' END AS channel
  FROM p LEFT JOIN ft ON ft.user_id = p.user_id
)
SELECT channel, count(*) AS conversions,
       round(CAST(sum(CAST(conv_value AS DECIMAL(28,4))) AS DOUBLE), 4) AS revenue
FROM cr GROUP BY 1""")),
    // LAST-touch attribution (conversion-proximity view): latest qualifying
    // touch at-or-before each purchase via the single-shuffle as-of join;
    // equal-ts touches pre-collapsed (larger event_id wins) so the credit
    // is unique
    GraftQuery(
      "events_attribution_last",
      (s, dir) => graft.operators.Cohort.attribution(
        Tables.events(s, dir), "purchase", Seq("view", "click"), first = false),
      Some("""WITH t AS (
  SELECT user_id, CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS BIGINT) AS us,
         arg_max(event_type, event_id) AS touch_type
  FROM events WHERE event_type IN ('view', 'click') GROUP BY 1, 2
),
p AS (
  SELECT event_id AS conv_id, user_id, CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS BIGINT) AS p_us,
         round(value, 4) AS conv_value
  FROM events WHERE event_type = 'purchase'
),
m AS (
  SELECT p.conv_id, p.conv_value, t.touch_type,
         row_number() OVER (PARTITION BY p.conv_id ORDER BY t.us DESC) AS rn
  FROM p LEFT JOIN t ON t.user_id = p.user_id AND t.us <= p.p_us
)
SELECT channel, count(*) AS conversions,
       round(CAST(sum(CAST(conv_value AS DECIMAL(28,4))) AS DOUBLE), 4) AS revenue
FROM (SELECT conv_id, conv_value, coalesce(touch_type, 'none') AS channel
      FROM m WHERE rn = 1)
GROUP BY 1""")),
    // semi-structured props: JSON payload field extracted map-side
    // (get_json_object — no parse-to-struct materialization), per-type
    // integer stats. The shape every event pipeline needs for loosely-typed
    // instrumentation payloads
    GraftQuery(
      "events_props_stats",
      (s, dir) => {
        val k = get_json_object(col("props"), "$.k").cast("long")
        Tables
          .events(s, dir)
          .select(col("event_type"), k.as("k"))
          .groupBy(col("event_type"))
          .agg(
            count(col("k")).as("n"),
            sum(col("k")).as("sum_k"),
            min(col("k")).as("min_k"),
            max(col("k")).as("max_k"))
      },
      Some("""SELECT event_type, count(k) AS n, CAST(sum(k) AS BIGINT) AS sum_k,
       min(k) AS min_k, max(k) AS max_k
FROM (SELECT event_type, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events)
GROUP BY 1""")),
    GraftQuery(
      "events_outliers_mad",
      (s, dir) => {
        val events = Tables.events(s, dir)
        val med = events
          .groupBy(col("event_type"))
          .agg(expr("percentile(value, 0.5)").as("med"))
        val dev = events
          .join(broadcast(med), Seq("event_type"))
          .withColumn("adev", abs(col("value") - col("med")))
        val mad = dev
          .groupBy(col("event_type"))
          .agg(expr("percentile(adev, 0.5)").as("mad"))
        dev
          .join(broadcast(mad), Seq("event_type"))
          .filter(col("adev") > lit(3.0) * col("mad"))
          .select(
            col("event_id"),
            col("event_type"),
            round(col("value"), 4).as("value_r"),
            round(col("adev"), 4).as("abs_dev"))
      },
      Some("""WITH med AS (
  SELECT event_type, quantile_cont(value, 0.5) AS med FROM events GROUP BY 1
),
dev AS (
  SELECT e.event_id, e.event_type, e.value, abs(e.value - m.med) AS adev
  FROM events e JOIN med m ON m.event_type = e.event_type
),
mad AS (SELECT event_type, quantile_cont(adev, 0.5) AS mad FROM dev GROUP BY 1)
SELECT d.event_id, d.event_type, round(d.value, 4) AS value_r, round(d.adev, 4) AS abs_dev
FROM dev d JOIN mad m ON m.event_type = d.event_type
WHERE d.adev > 3 * m.mad"""))
  )
}
