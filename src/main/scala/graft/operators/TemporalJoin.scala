package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins Spark lacks as built-ins, expressed as single-shuffle
  * relational plans (no per-row point lookups, no driver-side state):
  *
  *  - [[asofJoin]]: for every left row, the LATEST right row at-or-before
  *    its timestamp (or earliest at-or-after, `direction = "forward"`) with
  *    matching keys — the union + running-`last` formulation: ONE shuffle on
  *    the key columns, an in-partition sort, and a window carry. No range
  *    explosion, no per-left-row probe.
  *  - [[rangeJoin]]: all (left, right) pairs with matching keys whose
  *    timestamps fall within a bounded interval — the BANDED formulation:
  *    each side lands in fixed-width time bands, the equi-join runs on
  *    (keys, band), and the exact interval predicate filters the band
  *    candidates. A left row probes at most `⌈(upper-lower)/band⌉ + 1`
  *    bands, so cost is candidates-bounded instead of the O(n·m) cross
  *    product a naive inequality join degenerates to.
  *
  * Timestamps are epoch-integer columns (e.g. `unix_micros`) so every
  * comparison and tolerance subtraction is exact long arithmetic — no
  * timestamp-internal representation ever reaches a comparison or a result.
  *
  * Scale shape: both plans shuffle each input exactly once, on keys the
  * data is already naturally distributed by (user, entity, series). Skew
  * concentrates only where a single (key, band) cell is hot — widen the
  * band or salt the cell, not the whole join.
  */
object TemporalJoin {

  /** As-of join. `left` keeps all its columns; for each left row the right
    * row selected by the as-of rule contributes `payloadCols` plus its
    * timestamp as `matchedTsCol` (all null when no right row qualifies —
    * left-outer semantics).
    *
    * Contract: `right` must be unique per (keys, rightTs) — pre-aggregate
    * duplicates (e.g. `max` per key+ts) so the "latest" row is well
    * defined; ties at equal timestamps resolve to the right row (backward:
    * `leftTs >= rightTs` inclusive, the ASOF convention).
    *
    * `toleranceMicros` bounds the match age: matches further than the
    * tolerance from the left timestamp are nulled out (the row itself
    * stays — still left-outer).
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame, // keys ++ rightTsCol ++ payloadCols, unique per (keys, ts)
      keys: Seq[String],
      leftTsCol: String,
      rightTsCol: String,
      payloadCols: Seq[String],
      matchedTsCol: String = "matched_ts",
      direction: String = "backward",
      toleranceMicros: Option[Long] = None
  ): DataFrame = {
    require(keys.nonEmpty, "asofJoin needs at least one key column")
    require(
      direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got $direction")
    toleranceMicros.foreach(t => require(t >= 0, s"tolerance must be >= 0, got $t"))

    val leftCols = left.columns.toSeq
    require(
      !(payloadCols :+ matchedTsCol).exists(leftCols.contains),
      s"right payload ${payloadCols.mkString(",")}/$matchedTsCol collide with left columns")

    // one tagged stream: right rows (side 0) sort before left rows (side 1)
    // at equal timestamps, so the inclusive tie lands on the right row
    val tagged = right
      .select(
        keys.map(col) ++
          Seq(col(rightTsCol).cast("long").as("_ts"), lit(0).as("_side")) ++
          leftCols.filterNot(keys.contains).map(c => lit(null).as(c)) ++
          payloadCols.map(col) :+ col(rightTsCol).cast("long").as(matchedTsCol): _*)
      .unionByName(
        left.select(
          keys.map(col) ++
            Seq(col(leftTsCol).cast("long").as("_ts"), lit(1).as("_side")) ++
            leftCols.filterNot(keys.contains).map(col) ++
            payloadCols.map(c => lit(null).as(c)) :+ lit(null).cast("long").as(matchedTsCol): _*))

    val ord =
      if (direction == "backward") Seq(col("_ts").asc, col("_side").asc)
      else Seq(col("_ts").desc, col("_side").asc)
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = (payloadCols :+ matchedTsCol).foldLeft(tagged) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }

    val inTol = toleranceMicros match {
      case Some(t) =>
        if (direction == "backward") col("_ts") - col(matchedTsCol) <= t
        else col(matchedTsCol) - col("_ts") <= t
      case None => lit(true)
    }
    val bounded = (payloadCols :+ matchedTsCol).foldLeft(carried) { (df, c) =>
      df.withColumn(c, when(inTol, col(c)))
    }

    bounded
      .filter(col("_side") === 1)
      .withColumn(leftTsCol, col("_ts"))
      .select((leftCols ++ payloadCols :+ matchedTsCol).map(col): _*)
  }

  /** Banded interval join: every (left, right) pair with equal `keys` and
    * `rightTs ∈ [leftTs + lowerMicros, leftTs + upperMicros]` (inclusive).
    * Inner semantics — compose a left-outer aggregate by joining the result
    * back to `left`. Right columns other than keys pass through, so they
    * must not collide with left's non-key columns.
    *
    * `bandMicros` is the bucketing width (default: the window width): each
    * right row lands in ONE band, each left row fans to the bands its
    * window overlaps — the standard banded range-join shape whose candidate
    * set is |window|/|band| bands rather than the whole key group.
    */
  def rangeJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTsCol: String,
      rightTsCol: String,
      lowerMicros: Long,
      upperMicros: Long,
      bandMicros: Long = 0L
  ): DataFrame = {
    require(keys.nonEmpty, "rangeJoin needs at least one key column")
    require(upperMicros >= lowerMicros, s"empty window [$lowerMicros, $upperMicros]")
    val band = if (bandMicros > 0) bandMicros else math.max(upperMicros - lowerMicros, 1L)

    // floor division via pmod (floor semantics on negatives too), so both
    // sides band identically; the subtracted-remainder quotient is an exact
    // integer well under 2^53, so the double division cannot round
    def bandOf(c: org.apache.spark.sql.Column) = {
      val d = c.cast("long")
      ((d - pmod(d, lit(band))) / lit(band)).cast("long")
    }

    val r = right.withColumn("_band", bandOf(col(rightTsCol).cast("long")))
    val lo = col(leftTsCol).cast("long") + lowerMicros
    val hi = col(leftTsCol).cast("long") + upperMicros
    val l = left
      .withColumn("_b0", bandOf(lo))
      .withColumn("_b1", bandOf(hi))
      .withColumn("_band", explode(sequence(col("_b0"), col("_b1"))))
      .drop("_b0", "_b1")

    l.join(r, keys :+ "_band")
      .filter(
        col(rightTsCol).cast("long") >= col(leftTsCol).cast("long") + lowerMicros &&
          col(rightTsCol).cast("long") <= col(leftTsCol).cast("long") + upperMicros)
      .drop("_band")
  }
}
