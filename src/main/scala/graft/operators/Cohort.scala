package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cohort analytics over an event stream — the two aggregations every
  * product/ingest dashboard runs next to the funnel: day-N retention by
  * signup cohort, and conversion attribution (first-touch / last-touch).
  *
  * Determinism: calendar days travel as integer days-since-epoch (the date
  * internals never reach a comparison), retention shares are integer basis
  * points, attributed revenue follows the repo's float-aggregate contract
  * (per-value round → DECIMAL sum → round).
  *
  * Scale shape: retention is two user-keyed shuffles (first-day, then the
  * distinct (user, offset) dedup) and one tiny (cohort, offset) roll-up —
  * the cohort-size frame is nDays rows, broadcast. Attribution shuffles on
  * the user key only; the first-touch arm carries one row per user, the
  * last-touch arm rides [[TemporalJoin.asofJoin]]'s single-shuffle
  * union-and-carry (never a per-purchase probe or range explosion).
  */
object Cohort {

  /** Day-N retention: cohort = the user's first active day; a user is
    * retained at offset d if they have any event on cohort_day + d.
    * One row per (cohort_day, day_offset) with the cohort's size and the
    * retained share in basis points. Offset 0 is the cohort itself
    * (retained_bp = 10000 by construction — kept, the dashboard convention).
    */
  def retention(
      events: DataFrame,
      userCol: String = "user_id",
      tsCol: String = "ts"
  ): DataFrame = {
    val days = events.select(
      col(userCol),
      datediff(to_date(col(tsCol)), to_date(lit("1970-01-01"))).as("_day"))
    val cohorts = days
      .groupBy(col(userCol))
      .agg(min(col("_day")).as("cohort_day"))
    renderRetention(
      days
        .join(cohorts, userCol)
        .select(
          col(userCol).as("user_id"),
          col("cohort_day"),
          (col("_day") - col("cohort_day")).as("day_offset"))
        .distinct())
  }

  /** Render distinct per-user activity cells (user_id, cohort_day,
    * day_offset) into the retention matrix — split out so the STREAMING
    * twin (whose GroupState emits exactly these cells across micro-batches)
    * renders identically. */
  private[graft] def renderRetention(active: DataFrame): DataFrame = {
    // cohort size = the offset-0 cell of the same aggregate (every user is
    // active on their own cohort day), carried across the cohort's rows by
    // a window over the AGGREGATED frame — ≤ cohorts×offsets rows, so the
    // window is tiny, and there is no self-join for Catalyst to dedup
    // (a sizes-side self-join trips conflicting-reference resolution on
    // streaming memory-sink lineage)
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("cohort_day"))
    active
      .groupBy(col("cohort_day"), col("day_offset"))
      .agg(count(lit(1)).as("active_users"))
      .withColumn(
        "cohort_users",
        max(when(col("day_offset") === 0, col("active_users"))).over(w))
      .select(
        col("cohort_day"),
        col("day_offset"),
        col("active_users"),
        col("cohort_users"),
        expr("CAST(active_users * 10000 DIV cohort_users AS BIGINT)").as("retained_bp"))
  }

  /** Conversion attribution: every `convType` event is credited to one
    * touch event (`touchTypes`) of the same user at-or-before it — the
    * FIRST such touch (`first = true`, the acquisition view) or the LAST
    * (`first = false`, the conversion-proximity view). Conversions with no
    * qualifying touch credit the `"none"` channel. Output: one row per
    * channel with conversion count and attributed revenue.
    *
    * Ties at equal timestamps: first-touch takes the smaller event_id,
    * last-touch the larger (both orders total, so the credit is unique).
    */
  def attribution(
      events: DataFrame,
      convType: String = "purchase",
      touchTypes: Seq[String] = Seq("view", "click"),
      first: Boolean = true
  ): DataFrame = {
    require(touchTypes.nonEmpty, "attribution needs at least one touch type")
    val touches = events
      .filter(col("event_type").isin(touchTypes: _*))
      .select(
        col("user_id"),
        unix_micros(col("ts")).as("t_us"),
        col("event_id"),
        col("event_type"))
    val purch = events
      .filter(col("event_type") === convType)
      .select(
        col("event_id").as("conv_id"),
        col("user_id"),
        unix_micros(col("ts")).as("p_us"),
        round(col("value"), 4).as("conv_value"))
    val credited =
      if (first) {
        // one row per user: the globally earliest touch; it attributes every
        // conversion at-or-after it (min over a struct = lexicographic
        // (ts, id, type) — deterministic, map-side partials)
        val firstTouch = touches
          .groupBy(col("user_id"))
          .agg(min(struct(col("t_us"), col("event_id"), col("event_type"))).as("ft"))
          .select(col("user_id"), col("ft.t_us").as("t_us"), col("ft.event_type").as("touch_type"))
        purch
          .join(firstTouch, Seq("user_id"), "left")
          .select(
            col("conv_id"),
            col("conv_value"),
            when(col("t_us").isNotNull && col("t_us") <= col("p_us"), col("touch_type"))
              .otherwise(lit("none")).as("channel"))
      } else {
        // latest touch at-or-before each conversion: asofJoin's single
        // user-keyed shuffle; right side pre-aggregated per (user, ts) so
        // "latest" is unique (equal-ts ties → larger event_id)
        val uniq = touches
          .groupBy(col("user_id"), col("t_us"))
          .agg(max_by(col("event_type"), col("event_id")).as("touch_type"))
        TemporalJoin
          .asofJoin(
            purch, uniq, Seq("user_id"), "p_us", "t_us",
            payloadCols = Seq("touch_type"), matchedTsCol = "touch_us")
          .select(
            col("conv_id"),
            col("conv_value"),
            coalesce(col("touch_type"), lit("none")).as("channel"))
      }
    renderAttribution(credited)
  }

  /** Roll credited conversions (conv_id, conv_value, channel) into the
    * per-channel dashboard — shared with the STREAMING twin so both render
    * identically (round→DECIMAL-sum contract). */
  private[graft] def renderAttribution(credited: DataFrame): DataFrame =
    credited
      .groupBy(col("channel"))
      .agg(
        count(lit(1)).as("conversions"),
        round(
          sum(col("conv_value").cast("decimal(28,4)")).cast("double"),
          4).as("revenue"))
}
