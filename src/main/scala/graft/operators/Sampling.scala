package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic corpus sampling for the training-data pipeline —
  * layout-independent (keys derive from CONTENT, never from partition or
  * row position), so a sample is reproducible across runs, cluster sizes,
  * and file orderings.
  */
object Sampling {

  /** Content-derived pseudo-random sort key: polynomial char-fold of the
    * md5 hex digest (same fold the oracle can compute — the dedup queries'
    * `sqlTokenHash` device). Equal text ⇒ equal key; the fold whitens the
    * digest into a uniform [0, HashP) long that fits a double exactly. */
  private def contentKey(textCol: Column): Column =
    TextAnalysis.tokenHash(md5(textCol.cast("binary"))).cast("double")

  /** Stratified QUOTA sample: the first `quota` documents of every stratum
    * in content-hash order. Per-stratum selection rides the bounded-heap
    * top-k aggregate (graft.plans.TopKAgg) — map-side partial top-quota,
    * so the shuffle carries ≤ quota rows per (stratum, partition) and a
    * corpus-popular stratum never becomes one giant sorted partition (the
    * skew hazard of the row_number formulation at 100 TB).
    *
    * Output: (stratum, doc_id, sample_rank), rank 1-based in hash order.
    */
  def stratifiedQuota(
      docs: DataFrame, // (doc_id, text, <stratum col>)
      stratumCol: String,
      quota: Int,
      idCol: String = "doc_id",
      textCol: String = "text"
  ): DataFrame =
    BruteForce
      .topK(
        docs.select(
          col(stratumCol).as("qid"),
          col(idCol).as("nid"),
          contentKey(col(textCol)).as("dist")),
        quota,
        ascending = true)
      .select(
        col("qid").as(stratumCol),
        col("nid").as(idCol),
        col("rnk").as("sample_rank"))

  /** Rate-based Bernoulli sample: keep a document iff its content key
    * falls under `rate` of the key space — map-side only, no shuffle, no
    * state; the per-stratum twin of [[Dedup.hashSplit]]'s byte buckets.
    * Exactly reproducible: the decision is a pure function of the text. */
  def hashRate(
      docs: DataFrame,
      rate: Double,
      textCol: String = "text"
  ): DataFrame = {
    require(rate >= 0.0 && rate <= 1.0, s"rate $rate outside [0, 1]")
    docs.filter(
      contentKey(col(textCol)) < lit(math.floor(rate * TextAnalysis.HashP.toDouble)))
  }

  /** Domain-mixture sampling: per-stratum Bernoulli rates expressed as
    * EXACT rationals (keep ⟺ den·key < num·HashP, all in long arithmetic
    * — no float threshold can disagree with the oracle at a boundary).
    * `rates` maps stratum → (num, den); strata absent from the map are
    * dropped. Map-side only: the rate table rides the closure as a CASE
    * column (broadcast territory even at thousands of strata), the
    * decision is a pure function of (stratum, text) — reproducible across
    * runs, cluster sizes, and file orderings; the 100 TB shape for
    * up/down-weighting sources into a training mixture. */
  def mixtureSample(
      docs: DataFrame,
      rates: Map[String, (Int, Int)],
      stratumCol: String = "source",
      textCol: String = "text"
  ): DataFrame = {
    require(rates.nonEmpty, "rates must not be empty")
    rates.foreach { case (s, (num, den)) =>
      require(den > 0 && num >= 0 && num <= den, s"rate $num/$den for $s outside [0, 1]")
    }
    val num = rates.foldLeft(lit(null).cast("long")) { case (acc, (s, (n, _))) =>
      when(col(stratumCol) === s, lit(n.toLong)).otherwise(acc)
    }
    val den = rates.foldLeft(lit(null).cast("long")) { case (acc, (s, (_, d))) =>
      when(col(stratumCol) === s, lit(d.toLong)).otherwise(acc)
    }
    // the raw LONG fold (not contentKey's double view): the comparison
    // must be integer-exact end to end
    val key = TextAnalysis.tokenHash(md5(col(textCol).cast("binary")))
    docs.filter(num.isNotNull && den * key < num * lit(TextAnalysis.HashP))
  }

  /** Token-budget corpus selection: per stratum, keep documents in
    * (quality desc, doc_id asc) order while the running `n_chars` total
    * stays within `budget` — the "best docs per source under a size cap"
    * pass a training-mixture builder runs after quality scoring.
    *
    * Semantics = the window rule `sum(n_chars) OVER (PARTITION BY source
    * ORDER BY quality DESC, doc_id) <= budget`, but the PLAN avoids the
    * per-source global sort that window implies (one giant sorted
    * partition per source — the 100 TB skew hazard): quality is 4dp, so
    * docs bucket into ≤ ~10^5 distinct scaled-quality values per source.
    * A (source, q4) roll-up — one small aggregate — lets the driver walk
    * each source's buckets best-first and find the BOUNDARY bucket where
    * the budget crosses; whole buckets above it keep map-side via a
    * broadcast threshold table, and only the boundary bucket (docs tied
    * at one exact quality value) pays a cumsum sort. Output is identical
    * to the window rule; the oracle states the window form.
    *
    * Input needs (doc_id, `stratumCol`, n_chars, quality) with quality
    * already 4dp-rounded. Output: kept (doc_id, stratum, quality,
    * n_chars) rows. */
  def budgetSelect(
      docs: DataFrame,
      budget: Long,
      stratumCol: String = "source"
  ): DataFrame = {
    require(budget >= 0L, s"budget must be >= 0, got $budget")
    import org.apache.spark.sql.expressions.Window
    val spark = docs.sparkSession
    val q4d = docs.withColumn("_q4", round(col("quality") * 10000).cast("long"))
    val buckets = q4d
      .groupBy(col(stratumCol).cast("string").as("_s"), col("_q4"))
      .agg(sum(col("n_chars")).as("_bytes"))
      .collect()
    // bounded by strata × distinct 4dp qualities, not by corpus rows —
    // loud guard, same convention as the sparse query-plan collects
    require(
      buckets.length <= 2000000,
      s"budgetSelect bucket table too large (${buckets.length}); " +
        "quality must be low-cardinality (4dp-rounded)")
    val thresholds = buckets
      .groupBy(_.getString(0))
      .map { case (s, rows) =>
        val sorted = rows.map(r => (r.getLong(1), r.getLong(2))).sortBy(-_._1)
        var cum = 0L
        var q4Star = Long.MinValue
        var remaining = 0L
        var crossed = false
        sorted.foreach { case (q4, bytes) =>
          if (!crossed) {
            if (cum + bytes <= budget) cum += bytes
            else { q4Star = q4; remaining = budget - cum; crossed = true }
          }
        }
        (s, q4Star, remaining)
      }
      .toSeq
    import spark.implicits._
    val thr = broadcast(thresholds.toDF("_s", "_q4s", "_rem"))
    val joined = q4d
      .withColumn("_s", col(stratumCol).cast("string"))
      .join(thr, "_s")
    val out = Seq(col("doc_id"), col(stratumCol), col("quality"), col("n_chars"))
    val full = joined.filter(col("_q4") > col("_q4s")).select(out: _*)
    val boundary = joined
      .filter(col("_q4") === col("_q4s"))
      .withColumn(
        "_cum",
        sum(col("n_chars")).over(
          Window
            .partitionBy(col("_s"))
            .orderBy(col("doc_id").asc)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter(col("_cum") <= col("_rem"))
      .select(out: _*)
    full.unionByName(boundary)
  }

  /** Deterministic CURRICULUM ordering — quality-descending, content-hash
    * shuffled within equal quality: the training-order permutation of
    * curriculum schedules (easy/clean first), reproducible across
    * layouts. Same two-phase shape as [[shuffleRank]], with the 4dp
    * quality grid as the bucket key: per-bucket counts (≤ distinct 4dp
    * values, a bounded driver frame) → prefix offsets broadcast → ranks
    * within each bucket by (hash, id). Never a global single-reducer
    * sort. Bucket key is the integer-exact scaled quality
    * ([[TextAnalysis.qualityQi]]) computed inline — no score join. */
  def curriculumRank(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val keyed = docs
      .select(
        col("doc_id"),
        TextAnalysis.qualityQi(TextAnalysis.tokens(col("text"))).as("_qi"),
        TextAnalysis.tokenHash(md5(col("text").cast("binary"))).as("_k"))
    val counts = keyed.groupBy(col("_qi")).count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).sortBy(-_._1)
    val offsets = counts.map(_._1).zip(
      counts.map(_._2).scanLeft(0L)(_ + _).dropRight(1)).toMap
    val spark = docs.sparkSession
    import spark.implicits._
    val offDf = broadcast(offsets.toSeq.toDF("_qi", "_off"))
    keyed
      .join(offDf, "_qi")
      .withColumn(
        "_rn",
        row_number().over(
          Window.partitionBy(col("_qi")).orderBy(col("_k").asc, col("doc_id").asc)))
      .select(col("doc_id"), (col("_off") + col("_rn")).as("curriculum_rank"))
  }

  /** Deterministic GLOBAL shuffle rank — "shuffle the training data" as a
    * reproducible permutation: every document gets its position in
    * content-hash order (seedless, layout-independent, identical on every
    * run). The 100 TB shape is the point: a naive
    * `row_number() OVER (ORDER BY hash)` funnels the corpus through ONE
    * sorted partition; here the rank is two-phase — (1) range-bucket the
    * key space (order-preserving `key·B DIV P`), count per bucket, prefix-
    * sum the ≤B counts driver-side; (2) rank WITHIN each bucket (B
    * concurrent partitioned sorts) and add the broadcast offset. Same
    * answer, no single-reducer sort. Ties (identical texts) break by id. */
  def shuffleRank(
      docs: DataFrame, // (idCol, textCol)
      idCol: String = "doc_id",
      textCol: String = "text",
      buckets: Int = 64
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val p = TextAnalysis.HashP
    val keyed = docs.select(
      col(idCol),
      TextAnalysis.tokenHash(md5(col(textCol).cast("binary"))).as("_k"))
      .withColumn("_b", expr(s"CAST(_k * $buckets DIV $p AS BIGINT)"))
    val counts = keyed.groupBy(col("_b")).count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = counts.map(_._1).zip(
      counts.map(_._2).scanLeft(0L)(_ + _).dropRight(1)).toMap
    val spark = docs.sparkSession
    import spark.implicits._
    val offDf = broadcast(offsets.toSeq.toDF("_b", "_off"))
    keyed
      .join(offDf, "_b")
      .withColumn(
        "_rn",
        row_number().over(
          Window.partitionBy(col("_b")).orderBy(col("_k").asc, col(idCol).asc)))
      .select(col(idCol), (col("_off") + col("_rn")).as("shuffle_rank"))
  }
}
