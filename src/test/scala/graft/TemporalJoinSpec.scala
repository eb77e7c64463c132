package graft

import org.apache.spark.sql.functions._

import graft.operators.TemporalJoin

class TemporalJoinSpec extends SparkSpec {
  import spark.implicits._

  // quotes: (key, ts, price); trades: (key, ts, qty)
  private lazy val quotes = Seq(
    ("a", 10L, 1.0), ("a", 20L, 2.0), ("a", 30L, 3.0),
    ("b", 15L, 5.0)
  ).toDF("k", "q_ts", "price")
  private lazy val trades = Seq(
    ("a", 5L, 100L), // before any quote → null match
    ("a", 20L, 200L), // tie with quote@20 → inclusive
    ("a", 25L, 300L), // between 20 and 30 → quote@20
    ("b", 50L, 400L), // long gap → quote@15
    ("c", 9L, 500L) // key with no quotes → null
  ).toDF("k", "t_ts", "qty")

  private def asofMap(df: org.apache.spark.sql.DataFrame): Map[Long, (Any, Any)] =
    df.collect()
      .map(r => r.getAs[Long]("qty") -> ((r.getAs[Any]("price"), r.getAs[Any]("q_us"))))
      .toMap

  test("backward as-of picks latest at-or-before, inclusive tie, left-outer") {
    val got = asofMap(
      TemporalJoin.asofJoin(
        trades, quotes, Seq("k"), "t_ts", "q_ts",
        payloadCols = Seq("price"), matchedTsCol = "q_us"))
    assert(got(100L) == ((null, null)))
    assert(got(200L) == ((2.0, 20L))) // tie resolves to the right row
    assert(got(300L) == ((2.0, 20L)))
    assert(got(400L) == ((5.0, 15L)))
    assert(got(500L) == ((null, null)))
  }

  test("forward as-of picks earliest at-or-after") {
    val got = asofMap(
      TemporalJoin.asofJoin(
        trades, quotes, Seq("k"), "t_ts", "q_ts",
        payloadCols = Seq("price"), matchedTsCol = "q_us", direction = "forward"))
    assert(got(100L) == ((1.0, 10L)))
    assert(got(200L) == ((2.0, 20L))) // tie inclusive in both directions
    assert(got(300L) == ((3.0, 30L)))
    assert(got(400L) == ((null, null)))
  }

  test("tolerance nulls out stale matches but keeps the row") {
    val got = asofMap(
      TemporalJoin.asofJoin(
        trades, quotes, Seq("k"), "t_ts", "q_ts",
        payloadCols = Seq("price"), matchedTsCol = "q_us",
        toleranceMicros = Some(10L)))
    assert(got(300L) == ((2.0, 20L))) // 5 ticks back — inside tolerance
    assert(got(400L) == ((null, null))) // 35 ticks back — nulled
    assert(got.size == 5) // every trade row survives
  }

  test("rangeJoin matches the naive inequality join on every band layout") {
    val naive = trades
      .as("t")
      .join(
        quotes.as("q"),
        col("t.k") === col("q.k") &&
          col("q.q_ts") >= col("t.t_ts") - 10L && col("q.q_ts") <= col("t.t_ts") + 10L)
      .select(col("t.qty"), col("q.price"))
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
      .sorted
      .toSeq
    for (band <- Seq(1L, 3L, 10L, 100L)) {
      val banded = TemporalJoin
        .rangeJoin(trades, quotes, Seq("k"), "t_ts", "q_ts", -10L, 10L, bandMicros = band)
        .select(col("qty"), col("price"))
        .collect()
        .map(r => (r.getLong(0), r.getDouble(1)))
        .sorted
        .toSeq
      assert(banded == naive, s"band=$band")
    }
  }

  test("rangeJoin bands floor-consistently across negative timestamps") {
    val l = Seq(("a", -5L, 1L)).toDF("k", "l_ts", "lid")
    val r = Seq(("a", -8L, 10L), ("a", -1L, 20L), ("a", 4L, 30L)).toDF("k", "r_ts", "rid")
    val got = TemporalJoin
      .rangeJoin(l, r, Seq("k"), "l_ts", "r_ts", -4L, 6L, bandMicros = 3L)
      .select("rid")
      .collect()
      .map(_.getLong(0))
      .sorted
      .toSeq
    assert(got == Seq(10L, 20L)) // window [-9, 1]; 4 is outside
  }
}
