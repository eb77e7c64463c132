package graft.queries

import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Relational/streaming-analog operators: windowed event aggregation (the
  * batch view of the Structured Streaming pipeline in graft.streaming) and
  * representative analytics over the big tables. These exercise the engine's
  * shuffle/aggregate path at the scale tables (lineitem, events).
  */
object RelationalQueries {

  /** Tumbling-hour aggregation shared by the batch and streaming paths.
    * Hour emitted as a string so Spark/DuckDB timestamp internals never
    * touch the hash compare; exact-arithmetic sum (per-row round → decimal
    * → exact sum → double) so accumulation order cannot matter. */
  private[queries] def hourlyAgg(events: org.apache.spark.sql.DataFrame) =
    events
      .groupBy(
        date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH").as("hour"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        round(sum(round(col("value"), 6).cast("decimal(28,6)")).cast("double"), 4).as("total"))

  // sliding (hopping) windows: 1 h window, 15 min hop — each event lands
  // in 4 overlapping windows; same decimal-sum determinism contract
  private def slidingAgg(ev: org.apache.spark.sql.DataFrame) =
    ev.groupBy(
      window(col("ts"), "1 hour", "15 minutes"),
      col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        round(sum(round(col("value"), 6).cast("decimal(28,6)")).cast("double"), 4).as("total"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm").as("win_start"),
        col("event_type"), col("n"), col("total"))

  private val slidingSql =
    """WITH w AS (
  SELECT make_timestamp((epoch_us(ts) // 900000000) * 900000000 - j.j * 900000000) AS ws,
    event_type, value
  FROM events CROSS JOIN range(0, 4) j(j)
)
SELECT strftime(ws, '%Y-%m-%d %H:%M') AS win_start, event_type, count(*) AS n,
  round(CAST(sum(CAST(round(value, 6) AS DECIMAL(28,6))) AS DOUBLE), 4) AS total
FROM w GROUP BY 1, 2"""

  private val hourlySql =
    """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H') AS hour, event_type,
count(*) AS n, round(CAST(sum(CAST(round(value, 6) AS DECIMAL(28,6))) AS DOUBLE), 4) AS total
FROM events GROUP BY 1, 2"""

  def all: Seq[GraftQuery] = Seq(
    // tumbling-window event aggregation (streaming CC analog, batch view)
    GraftQuery(
      "events_hourly",
      (s, dir) => hourlyAgg(Tables.events(s, dir)),
      Some(hourlySql)),
    // the SAME aggregation executed through Structured Streaming
    // (readStream → complete-mode memory sink, AvailableNow trigger) —
    // the growing-segment CC path under the driver's oracle gate: the
    // streaming result must hash-match the batch oracle exactly
    GraftQuery(
      "events_hourly_stream",
      (s, dir) => {
        import org.apache.spark.sql.streaming.Trigger
        val schema = s.read.parquet(s"$dir/events.parquet").schema
        // the file-stream source requires a directory; stage the single
        // parquet file into one (read-only testdata must not be touched)
        val stage = StreamStage.dir("graft-events-stream")
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
        val sink = s"events_hourly_stream_${System.nanoTime()}"
        StreamStage.withStatePartitions(s) {
          val q = hourlyAgg(ev).writeStream
            .format("memory")
            .queryName(sink)
            .outputMode("complete")
            .trigger(Trigger.AvailableNow())
            .start()
          q.awaitTermination()
        }
        s.table(sink)
      },
      Some(hourlySql)),
    // SLIDING-window aggregation (1 h / 15 min hop): the overlap fan-out
    // is map-side (window() explodes 4 rows per event before the partial
    // agg), so the shuffle still carries only (window, type) partials
    GraftQuery(
      "events_sliding",
      (s, dir) => slidingAgg(Tables.events(s, dir)),
      Some(slidingSql)),
    // the same sliding aggregation through Structured Streaming
    // (complete-mode memory sink) — hash-matches the batch oracle
    GraftQuery(
      "events_sliding_stream",
      (s, dir) => {
        import org.apache.spark.sql.streaming.Trigger
        val schema = s.read.parquet(s"$dir/events.parquet").schema
        val stage = StreamStage.dir("graft-sliding-stream")
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
        val sink = s"events_sliding_stream_${System.nanoTime()}"
        StreamStage.withStatePartitions(s) {
          val q = slidingAgg(ev).writeStream
            .format("memory")
            .queryName(sink)
            .outputMode("complete")
            .trigger(Trigger.AvailableNow())
            .start()
          q.awaitTermination()
        }
        s.table(sink)
      },
      Some(slidingSql)),
    // classic aggregation over the largest table (map-side partial agg +
    // single shuffle on the group keys)
    GraftQuery(
      "lineitem_pricing",
      (s, dir) =>
        Tables
          .lineitem(s, dir)
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            // l_quantity is integral → double sum is exact at any order
            round(sum(col("l_quantity")), 4).as("sum_qty"),
            round(
              sum(round(col("l_extendedprice") * (lit(1.0d) - col("l_discount")), 6)
                .cast("decimal(28,6)")).cast("double"),
              4).as("revenue"),
            count(lit(1)).as("n_rows")),
      Some("""SELECT l_returnflag, l_linestatus,
round(sum(l_quantity), 4) AS sum_qty,
round(CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount), 6) AS DECIMAL(28,6))) AS DOUBLE), 4) AS revenue,
count(*) AS n_rows
FROM lineitem GROUP BY 1, 2""")),
    // exact distinct-count at scale, two-phase: the naive
    // count(DISTINCT user_id) funnels every row of a hot event_type into
    // one reducer; the two-phase shape first dedups on the COMPOSITE key
    // (event_type, user_id) — that shuffle spreads a hot type across the
    // cluster by user — then counts per type with map-side partials.
    // Same answer, no single-reducer bottleneck.
    GraftQuery(
      "events_distinct_users",
      (s, dir) =>
        Tables
          .events(s, dir)
          .select(col("event_type"), col("user_id"))
          .distinct()
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_users")),
      Some("""SELECT event_type, count(DISTINCT user_id) AS n_users
FROM events GROUP BY 1""")),
    // the SAME exact distinct as a STREAM: stateful dropDuplicates on the
    // COMPOSITE key (state + shuffle spread across (event_type, user_id)
    // — the streaming twin of the batch two-phase shape; a hot event_type
    // never funnels into one state partition) feeding a running count in
    // complete mode. Dedup state persists across micro-batches, so the
    // final table equals the batch oracle whatever the batch split.
    GraftQuery(
      "events_distinct_users_stream",
      (s, dir) => {
        import org.apache.spark.sql.streaming.Trigger
        val schema = s.read.parquet(s"$dir/events.parquet").schema
        val stage = StreamStage.dir("graft-events-distinct")
        java.nio.file.Files.copy(
          java.nio.file.Paths.get(s"$dir/events.parquet"),
          stage.resolve("events.parquet"))
        val ev = s.readStream.schema(schema).parquet(stage.toString)
        val sink = s"events_distinct_users_stream_${System.nanoTime()}"
        StreamStage.withStatePartitions(s) {
          val q = ev
            .select(col("event_type"), col("user_id"))
            .dropDuplicates("event_type", "user_id")
            .groupBy(col("event_type"))
            .agg(count(lit(1)).as("n_users"))
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
      Some("""SELECT event_type, count(DISTINCT user_id) AS n_users
FROM events GROUP BY 1""")),
    // star join with the right strategy per dimension: nation (25 rows)
    // is BROADCAST — never shuffled — while orders⋈customer shuffles on
    // the join key once; the fact table's revenue rounds per-row into an
    // exact decimal sum. At 100 TB this is the canonical shape: one
    // shuffle on the fact side, zero for the small dim.
    GraftQuery(
      "orders_by_nation",
      (s, dir) =>
        Tables
          .orders(s, dir)
          .join(Tables.customer(s, dir),
            col("o_custkey") === col("c_custkey"))
          .join(broadcast(Tables.nation(s, dir)),
            col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name"))
          .agg(
            count(lit(1)).as("n_orders"),
            round(sum(round(col("o_totalprice"), 6).cast("decimal(28,6)")).cast("double"), 4)
              .as("revenue")),
      Some("""SELECT n_name, count(*) AS n_orders,
round(CAST(sum(CAST(round(o_totalprice, 6) AS DECIMAL(28,6))) AS DOUBLE), 4) AS revenue
FROM orders JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY 1""")),
    // approximate distinct via a mergeable HLL sketch (graft.plans.HllAgg):
    // where the exact two-phase distinct above shuffles every deduped key,
    // the sketch shuffles ONE 256-byte register table per (group,
    // partition) — the 100 TB shape for cardinality dashboards. Register
    // maxes are order/merge-tree independent and the estimate arithmetic
    // is mirrored operation-for-operation in the oracle (exact decimal sum
    // of the dyadic 2^-M_j terms), so the approximation sits under the
    // driver's exact hash gate. user_id exercises the linear-counting
    // branch at sf0.01; event_id the raw-estimate branch.
    GraftQuery(
      "events_hll_users",
      (s, dir) =>
        Tables
          .events(s, dir)
          .groupBy(col("event_type"))
          .agg(
            round(graft.plans.HllAgg.hllDistinct(col("user_id")), 4).as("hll_users"),
            round(graft.plans.HllAgg.hllDistinct(col("event_id")), 4).as("hll_events")),
      Some(HllOracle.sql)),
    // the SAME sketch as a STREAM: the 256-byte register table IS the
    // streaming state (serialized buffer per group in the state store),
    // max-merged across micro-batches — so the final estimate equals the
    // batch oracle whatever the batch split, under the same hash gate
    GraftQuery(
      "events_hll_users_stream",
      (s, dir) => {
        import org.apache.spark.sql.streaming.Trigger
        val schema = s.read.parquet(s"$dir/events.parquet").schema
        val stage = StreamStage.dir("graft-events-hll")
        java.nio.file.Files.copy(
          java.nio.file.Paths.get(s"$dir/events.parquet"),
          stage.resolve("events.parquet"))
        val ev = s.readStream.schema(schema).parquet(stage.toString)
        val sink = s"events_hll_users_stream_${System.nanoTime()}"
        StreamStage.withStatePartitions(s) {
          val q = ev
            .groupBy(col("event_type"))
            .agg(
              round(graft.plans.HllAgg.hllDistinct(col("user_id")), 4).as("hll_users"),
              round(graft.plans.HllAgg.hllDistinct(col("event_id")), 4).as("hll_events"))
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
      Some(HllOracle.sql)),
    // mergeable histogram-quantile sketch (graft.plans.HistogramQuantileAgg)
    // — the deterministic KLL/t-digest counterpart: the exact percentile
    // query shuffles every value; this ships one fixed 64 KiB count vector
    // per (group, partition) and reads quantiles off cumulative counts.
    // Bucket math is integer/power-of-two exact, so the approximation sits
    // under the driver's exact hash gate
    GraftQuery(
      "events_sketch_quantiles",
      (s, dir) =>
        Tables
          .events(s, dir)
          .groupBy(col("event_type"))
          .agg(graft.plans.HistogramQuantileAgg
            .histQuantiles(round(col("value"), 6)).as("q"))
          .select(
            col("event_type"),
            col("q.p50").as("p50"),
            col("q.p95").as("p95"),
            col("q.p99").as("p99")),
      Some("""WITH b AS (
  SELECT event_type,
         least(greatest(CAST(floor(round(value, 6) * 8) AS BIGINT), 0), 8191) AS bucket
  FROM events
),
c AS (SELECT event_type, bucket, count(*) AS n FROM b GROUP BY 1, 2),
cum AS (
  SELECT event_type, bucket,
         sum(n) OVER (PARTITION BY event_type ORDER BY bucket) AS cum,
         sum(n) OVER (PARTITION BY event_type) AS total
  FROM c
)
SELECT event_type,
       CAST(min(CASE WHEN 100 * cum >= 50 * total THEN bucket END) AS BIGINT) / 8.0 AS p50,
       CAST(min(CASE WHEN 100 * cum >= 95 * total THEN bucket END) AS BIGINT) / 8.0 AS p95,
       CAST(min(CASE WHEN 100 * cum >= 99 * total THEN bucket END) AS BIGINT) / 8.0 AS p99
FROM cum GROUP BY 1""")),
    // the histogram sketch as a STREAM: the count vector is the streaming
    // state, vector-added across micro-batches — final read-off equals
    // the batch oracle whatever the batch split
    // rate-spike detection: each (hour, type) count vs its trailing-24-row
    // baseline (full windows only) — the ops-monitoring gate next to the
    // MAD outlier screen. The window runs over the ALREADY-AGGREGATED
    // hourly frame (hours × types rows), never the event scan; ratio in
    // integer bp, spike = ≥ 1.5× baseline
    GraftQuery(
      "events_rate_spikes",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val hourly = Tables
          .events(s, dir)
          .groupBy(
            date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH").as("hour"),
            col("event_type"))
          .agg(count(lit(1)).as("cnt"))
        val w = Window.partitionBy(col("event_type")).orderBy(col("hour"))
          .rowsBetween(-24, -1)
        hourly
          .withColumn("_pn", count(lit(1)).over(w))
          .withColumn("prev_sum", sum(col("cnt")).over(w))
          .filter(col("_pn") === 24)
          .select(
            col("hour"),
            col("event_type"),
            col("cnt"),
            expr("CAST(cnt * 24 * 10000 DIV prev_sum AS BIGINT)").as("ratio_bp"))
          .withColumn("spike", col("ratio_bp") >= 15000L)
      },
      Some("""WITH h AS (
  SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H') AS hour, event_type,
         count(*) AS cnt
  FROM events GROUP BY 1, 2
),
wd AS (
  SELECT hour, event_type, cnt,
    count(*) OVER (PARTITION BY event_type ORDER BY hour
                   ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING) AS pn,
    sum(cnt) OVER (PARTITION BY event_type ORDER BY hour
                   ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING) AS prev_sum
  FROM h
)
SELECT hour, event_type, cnt,
  CAST(cnt * 24 * 10000 // prev_sum AS BIGINT) AS ratio_bp,
  cnt * 24 * 10000 // prev_sum >= 15000 AS spike
FROM wd WHERE pn = 24""")),
    // multi-level subtotals in ONE pass (ROLLUP grouping sets): revenue by
    // region → nation → grand total. Catalyst's Expand fans each row to
    // its 3 grouping sets MAP-SIDE before the single partial-aggregated
    // shuffle — one exchange where three separate groupBys would pay
    // three. Dims broadcast; subtotal rows keyed '(all)'
    GraftQuery(
      "orders_rollup",
      (s, dir) => {
        val o = Tables.orders(s, dir)
        val c = Tables.customer(s, dir)
        val n = Tables.nation(s, dir)
        val r = Tables.region(s, dir)
        o.join(c, col("o_custkey") === col("c_custkey"))
          .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
          .rollup(col("r_name"), col("n_name"))
          .agg(
            count(lit(1)).as("n_orders"),
            round(
              sum(round(col("o_totalprice"), 6).cast("decimal(28,6)")).cast("double"),
              4).as("revenue"))
          .select(
            coalesce(col("r_name"), lit("(all)")).as("region"),
            coalesce(col("n_name"), lit("(all)")).as("nation"),
            col("n_orders"),
            col("revenue"))
      },
      Some("""SELECT coalesce(r_name, '(all)') AS region, coalesce(n_name, '(all)') AS nation,
  count(*) AS n_orders,
  round(CAST(sum(CAST(round(o_totalprice, 6) AS DECIMAL(28,6))) AS DOUBLE), 4) AS revenue
FROM orders o
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
JOIN region r ON r.r_regionkey = n.n_regionkey
GROUP BY ROLLUP(r_name, n_name)""")),
    GraftQuery(
      "events_sketch_quantiles_stream",
      (s, dir) => {
        import org.apache.spark.sql.streaming.Trigger
        val schema = s.read.parquet(s"$dir/events.parquet").schema
        val stage = StreamStage.dir("graft-events-hist")
        java.nio.file.Files.copy(
          java.nio.file.Paths.get(s"$dir/events.parquet"),
          stage.resolve("events.parquet"))
        val ev = s.readStream.schema(schema).parquet(stage.toString)
        val sink = s"events_sketch_quantiles_stream_${System.nanoTime()}"
        StreamStage.withStatePartitions(s) {
          val q = ev
            .groupBy(col("event_type"))
            .agg(graft.plans.HistogramQuantileAgg
              .histQuantiles(round(col("value"), 6)).as("q"))
            .select(
              col("event_type"),
              col("q.p50").as("p50"),
              col("q.p95").as("p95"),
              col("q.p99").as("p99"))
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
      Some("""WITH b AS (
  SELECT event_type,
         least(greatest(CAST(floor(round(value, 6) * 8) AS BIGINT), 0), 8191) AS bucket
  FROM events
),
c AS (SELECT event_type, bucket, count(*) AS n FROM b GROUP BY 1, 2),
cum AS (
  SELECT event_type, bucket,
         sum(n) OVER (PARTITION BY event_type ORDER BY bucket) AS cum,
         sum(n) OVER (PARTITION BY event_type) AS total
  FROM c
)
SELECT event_type,
       CAST(min(CASE WHEN 100 * cum >= 50 * total THEN bucket END) AS BIGINT) / 8.0 AS p50,
       CAST(min(CASE WHEN 100 * cum >= 95 * total THEN bucket END) AS BIGINT) / 8.0 AS p95,
       CAST(min(CASE WHEN 100 * cum >= 99 * total THEN bucket END) AS BIGINT) / 8.0 AS p99
FROM cum GROUP BY 1"""))
  )
}

/** DuckDB mirror of [[graft.plans.HllSketch]]: md5-hex bucket/rho parsing,
  * max-merged registers, exact decimal Z sum, identical estimate formula. */
private[queries] object HllOracle {

  private def est(key: String, out: String): String = s"""
h_$out AS (
  SELECT event_type, md5(CAST($key AS VARCHAR)) AS hx FROM events
),
parsed_$out AS (
  SELECT event_type,
         substr(hx, 1, 2) AS bucket,
         least(4 * length(regexp_extract(substr(hx, 3), '^0*'))
               + CASE WHEN substr(substr(hx, 3), length(regexp_extract(substr(hx, 3), '^0*')) + 1, 1)
                           IN ('8','9','a','b','c','d','e','f') THEN 0
                      WHEN substr(substr(hx, 3), length(regexp_extract(substr(hx, 3), '^0*')) + 1, 1)
                           IN ('4','5','6','7') THEN 1
                      WHEN substr(substr(hx, 3), length(regexp_extract(substr(hx, 3), '^0*')) + 1, 1)
                           IN ('2','3') THEN 2
                      ELSE 3 END + 1, 32) AS rho
  FROM h_$out
),
reg_$out AS (SELECT event_type, bucket, max(rho) AS m_j FROM parsed_$out GROUP BY 1, 2),
agg_$out AS (
  SELECT event_type,
         CAST(sum(CAST(power(2.0, -m_j) AS DECIMAL(38,35))) AS DOUBLE) AS z_present,
         count(*) AS v_present
  FROM reg_$out GROUP BY 1
),
est_$out AS (
  SELECT event_type,
         round(CASE WHEN 0.7213/(1 + 1.079/256.0)*65536.0/(z_present + (256 - v_present)) <= 640.0
                     AND (256 - v_present) > 0
                    THEN 256 * ln(256.0/(256 - v_present))
                    ELSE 0.7213/(1 + 1.079/256.0)*65536.0/(z_present + (256 - v_present)) END, 4) AS $out
  FROM agg_$out
)"""

  val sql: String =
    s"""WITH ${est("user_id", "hll_users")}, ${est("event_id", "hll_events")}
SELECT u.event_type, u.hll_users, e.hll_events
FROM est_hll_users u JOIN est_hll_events e ON u.event_type = e.event_type"""
}
