package graft.queries

import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Relational/streaming-analog operators: windowed event aggregation (the
  * batch view of the Structured Streaming pipeline in graft.streaming) and
  * representative analytics over the big tables. These exercise the engine's
  * shuffle/aggregate path at the scale tables (lineitem, events).
  */
object RelationalQueries {

  def all: Seq[GraftQuery] = Seq(
    // tumbling-window event aggregation (streaming CC analog, batch view).
    // Hour emitted as a string so Spark/DuckDB timestamp internals never
    // touch the hash compare.
    GraftQuery(
      "events_hourly",
      (s, dir) =>
        Tables
          .events(s, dir)
          .groupBy(
            date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH").as("hour"),
            col("event_type"))
          // exact-arithmetic sum: per-row round → decimal → exact sum →
          // double. A raw sum(double) is accumulation-order-dependent and
          // would flake the cross-engine hash compare.
          .agg(
            count(lit(1)).as("n"),
            round(sum(round(col("value"), 6).cast("decimal(28,6)")).cast("double"), 4).as("total")),
      Some("""SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H') AS hour, event_type,
count(*) AS n, round(CAST(sum(CAST(round(value, 6) AS DECIMAL(28,6))) AS DOUBLE), 4) AS total
FROM events GROUP BY 1, 2""")),
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
FROM lineitem GROUP BY 1, 2"""))
  )
}
