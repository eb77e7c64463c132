package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew handling for hot-key joins — the third tool next to broadcast
  * (small side) and AQE skew-split (runtime re-plan): SALTING, for when the
  * build side is too big to broadcast and a handful of keys dominate the
  * probe side (the power-law user/document/entity reality of every event
  * and corpus table).
  *
  * [[saltedJoin]] replicates each BUILD-side row `salts` times — one per
  * salt id — while every PROBE-side row lands in exactly ONE salt bucket
  * (deterministic hash of a per-row discriminator, so the plan is
  * reproducible, never `rand()`). The join key becomes (key, salt): a hot
  * key's probe rows spread over `salts` reducers instead of one, at the
  * cost of a `salts`× build-side replication — the standard trade, priced
  * explicitly by the caller.
  *
  * Correctness is layout-free: every probe row meets the one build replica
  * in its bucket, so the result equals the unsalted join row-for-row (the
  * oracle gate states the plain join).
  */
object Skew {

  /** Inner equi-join of `probe` (big, skewed) to `build` (per-key rows,
    * unique on `key`) with the build side salted `salts` ways.
    *
    * `discriminator` picks the probe column whose hash spreads a hot key's
    * rows across buckets (a unique row id is ideal; any high-cardinality
    * column works). Build rows must be unique per key — pre-aggregate
    * first, as with any dimension join. */
  def saltedJoin(
      probe: DataFrame,
      build: DataFrame,
      key: String,
      discriminator: Column,
      salts: Int = 8
  ): DataFrame = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    // xxhash64(NULL) is NULL, and a NULL _salt matches no build-side salt —
    // a null-discriminator probe row would silently vanish from the join.
    // Park those rows in bucket 0 so the row-for-row equality with the
    // plain join holds for every input.
    val p = probe.withColumn("_salt",
      coalesce(pmod(xxhash64(discriminator), lit(salts)).cast("int"), lit(0)))
    val b = build.withColumn("_salt", explode(sequence(lit(0), lit(salts - 1))))
    p.join(b, Seq(key, "_salt")).drop("_salt")
  }
}
