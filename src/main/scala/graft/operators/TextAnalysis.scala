package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for the training-data pipeline: tokenization,
  * token statistics, quality scoring, language-ID heuristic, and document
  * fingerprinting (rolling hash). All pure codegen'd column expressions —
  * deterministic in DOUBLE/LONG so the DuckDB oracle matches bit-for-bit.
  */
object TextAnalysis {

  val HashP = 1000000007L // fold modulus (fits 63-bit intermediate)
  val TokenB = 1000003L // token-level fold base

  /** Whitespace tokenization (corpus is single-space separated). */
  def tokens(text: Column): Column = split(text, " ")

  /** Canonical text normalization — the reference's case-fold helper
    * (`include/knowhere/tolower.h`) widened to the C4/CCNet dedup canon:
    * lowercase, strip everything outside [a-z0-9 ], collapse space runs,
    * trim. Pure map-side column expression; feeding the result into the
    * md5-grouped exact dedup catches re-encodings (case, punctuation,
    * whitespace) that byte-exact dedup misses. */
  def normalize(text: Column): Column =
    trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9 ]", ""), " +", " "))

  /** Polynomial character hash: fold (h·31 + ascii) mod P. The engine-side
    * analog of a BPE-ish stable token id — no global vocabulary join needed
    * (scale: per-row arithmetic only). Codegen'd (graft.plans.StrPolyHash);
    * byte≡char for the ASCII corpus, matching the oracle's char fold. */
  def tokenHash(tok: Column): Column = {
    import org.apache.spark.sql.GraftExpr
    GraftExpr.column(graft.plans.StrPolyHash(GraftExpr.expression(tok), HashP))
  }

  /** Interpreted per-character formulation (cross-check reference). */
  def tokenHashHof(tok: Column): Column =
    aggregate(
      sequence(lit(1), length(tok)),
      lit(0L),
      (h, i) => (h * 31L + ascii(tok.substr(i, lit(1)))) % HashP
    )

  /** Rolling document fingerprint: fold (h·B + tokenHash) mod P over tokens
    * in order. Equal texts ⇒ equal fingerprints. */
  def fingerprint(toks: Column): Column =
    aggregate(
      transform(toks, tokenHash(_)),
      lit(0L),
      (h, th) => (h * TokenB + th) % HashP
    )

  /** Token n-gram shingles as strings ("a b c"). */
  def shingles(toks: Column, n: Int): Column =
    when(size(toks) < n, array(concat_ws(" ", toks)))
      .otherwise(transform(
        sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n)))))

  /** Longest run of identical consecutive tokens — the repetition gate
    * (Gopher's "repeated-line" family restated at token granularity) that
    * catches degenerate generations ("the the the …") length/TTR metrics
    * miss. One fold over the token array carrying (prev, run, best) — pure
    * map-side, no shuffle, no window; at 100 TB this is a scan. */
  def maxTokenRun(df: DataFrame, textCol: String = "text"): DataFrame = {
    val t = tokens(col(textCol))
    val folded = aggregate(
      t,
      struct(lit("").as("prev"), lit(0).as("run"), lit(0).as("best")),
      (acc, x) => {
        val run = when(acc("prev") === x, acc("run") + 1).otherwise(lit(1))
        struct(x.as("prev"), run.as("run"), greatest(acc("best"), run).as("best"))
      },
      acc => acc("best"))
    df.select(col("doc_id"), folded.as("max_run"))
  }

  /** Winnowing fingerprints (Schleimer/Wilkerson/Aiken, MOSS): the min
    * shingle hash of every w-window of consecutive token-n-gram hashes,
    * distinct per doc. Guarantees any shared run of ≥ n+w-1 tokens yields a
    * shared fingerprint — the local-edit-robust containment detector dedup
    * fingerprints (one hash per doc) cannot express. Map-side HOFs only;
    * grouping docs by fingerprint downstream is one (fp)-keyed shuffle that
    * carries (doc_id, fp) pairs, never text. */
  def winnowingFingerprints(
      df: DataFrame,
      textCol: String = "text",
      n: Int = 3,
      w: Int = 4
  ): DataFrame = {
    // materialize the hash array in its own projection FIRST: a lambda
    // body re-evaluates every outer expression it references per element,
    // so an inline `hs` would recompute the whole shingle-hash array for
    // EVERY window — O(T²) interpreted work (measured 88 s at sf0.1;
    // 50× off). Bound as an attribute, each window is an O(w) slice-min.
    val hs = df.select(
      col("doc_id"),
      transform(shingles(tokens(col(textCol)), n), tokenHash(_)).as("_hs"))
    val nw = greatest(size(col("_hs")) - (w - 1), lit(1))
    val fps = array_distinct(
      transform(sequence(lit(1), nw), j => array_min(slice(col("_hs"), j, lit(w)))))
    hs.select(col("doc_id"), explode(fps).as("fp"))
  }

  /** Per-doc token statistics (token counting operator). */
  def tokenStats(df: DataFrame, textCol: String = "text"): DataFrame = {
    val t = tokens(col(textCol))
    df.select(
      col("doc_id"),
      size(t).as("n_tokens"),
      size(array_distinct(t)).as("n_uniq"),
      round(
        aggregate(t, lit(0.0d), (a, x) => a + length(x).cast("double")) / size(t).cast("double"),
        4).as("avg_token_len")
    )
  }

  /** Top-k characteristic terms per document by a TF-IDF-family score.
    *
    * Determinism across engines rules out `ln` (libm results can differ
    * in the last ulp, which a round-then-rank contract cannot absorb at
    * ranking boundaries), so the idf weight is the rational surrogate
    * (N+1)/(df+1) and the score is integer-scaled:
    *   score = tf · (N+1) · 10000 div (df+1)
    * — exact 64-bit arithmetic on both engines, same ordering behavior
    * (monotone in tf and in 1/df). Ties break by term ascending.
    *
    * Scale shape: one (doc_id, term) count aggregation, one vocab-sized
    * df aggregation, a shuffle join on `term` (vocab-keyed — wide text
    * never moves), then a per-doc rank whose partitions are bounded by
    * document length (distinct terms per doc), not corpus size. */
  def tfidfTopTerms(df: DataFrame, k: Int, textCol: String = "text"): DataFrame = {
    val exploded = df
      .select(col("doc_id"), explode(tokens(col(textCol))).as("term"))
    val tf = exploded.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val docsN = df.select(countDistinct(col("doc_id"))).head().getLong(0)
    val dfreq = exploded.distinct()
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
    // integer division via the exact-double idiom (quotient < 2^53):
    // num − pmod is an exact multiple of den, so the fp division is exact
    val num = col("tf") * lit((docsN + 1) * 10000L)
    val den = col("df") + lit(1L)
    tf
      .join(dfreq, "term")
      .select(
        col("doc_id"),
        col("term"),
        ((num - pmod(num, den)) / den).cast("long").as("score"))
      .withColumn("rnk",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("doc_id"))
          .orderBy(col("score").desc, col("term").asc)))
      .filter(col("rnk") <= k)
      .select(col("doc_id"), col("term"), col("score"), col("rnk"))
  }

  /** Signed HALF-UP integer division in exact 64-bit arithmetic:
    * round-half-away-from-zero of num/den for `den > 0`. Same exact-double
    * idiom as [[halfUpMeanScaled]] (num − pmod is a multiple of the
    * divisor, so the fp division is exact below 2^53). */
  private[graft] def halfUpDivSigned(num: Column, den: Column): Column = {
    val total = abs(num) * lit(2L) + den
    val twoD = den * lit(2L)
    val q = ((total - pmod(total, twoD)) / twoD).cast("long")
    when(num < 0, -q).otherwise(q)
  }

  /** Per-doc quality as an EXACT scaled integer, qi = round(quality·10⁴)
    * half-up. The score 2·ttr − 3·stop + 0.05·avgLen is a RATIONAL of
    * token counts — (40·distinct − 60·stops + Σlen) / (20·n) — so qi is
    * pure 64-bit integer arithmetic end to end: no `round(double)` anywhere,
    * hence no engine/version rounding divergence (round-5's only red oracle
    * rows were boundary quotients where DuckDB and Java BigDecimal round a
    * double's …5 differently). THE single source of truth for quality —
    * every quality consumer (scoring, percentile, dashboard, crosstab,
    * curriculum, budget select, streaming twin) derives from this column. */
  private[graft] def qualityQi(t: Column): Column = {
    val n = size(t).cast("long")
    val d = size(array_distinct(t)).cast("long")
    val s = size(filter(t, x => x === "a" || x === "the")).cast("long")
    val l = aggregate(t, lit(0L), (a, x) => a + length(x).cast("long"))
    halfUpDivSigned((lit(40L) * d - lit(60L) * s + l) * lit(10000L), lit(20L) * n)
  }

  /** The 4dp quality as a double: one exact long→double cast plus one
    * correctly-rounded IEEE division — bit-identical in any engine. */
  private[graft] def qualityCol(t: Column): Column =
    qualityQi(t).cast("double") / lit(10000.0d)

  /** Quality score: linear combination of type-token ratio, stopword ratio,
    * and mean token length (length/punct/stopword-ratio heuristics; the
    * corpus is already lowercase and unpunctuated). Computed via the
    * integer-exact [[qualityQi]] rational. */
  def qualityScore(df: DataFrame, textCol: String = "text"): DataFrame =
    df.select(col("doc_id"), qualityCol(tokens(col(textCol))).as("quality"))

  /** Per-source quality-percentile CALIBRATION — quality scores are not
    * comparable across domains (news prose vs forum posts score on
    * different scales), so per-source filtering thresholds are set on the
    * source-relative percentile, not the raw score. `pct_bp` = fraction
    * of same-source docs with STRICTLY smaller 4dp quality, in integer
    * basis points over (n_s − 1) — 0 for a source's worst doc, 10⁴ for
    * its unique best.
    *
    * Scale shape (the nucleusVocab bucket trick): docs collapse into
    * (source, 4dp-quality) buckets FIRST; the running sum windows only
    * the per-source bucket rows (distinct 4dp values ≪ docs — never a
    * per-doc window over the corpus), and the bucket ranks broadcast back
    * onto the scan. */
  def qualityPercentile(df: DataFrame, textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val t = tokens(col(textCol))
    val scored = df.select(
      col("doc_id"),
      col("source"),
      qualityCol(t).as("quality"),
      qualityQi(t).as("_qi"))
    val buckets = scored.groupBy(col("source"), col("_qi")).agg(count(lit(1)).as("_c"))
    val w = Window
      .partitionBy(col("source"))
      .orderBy(col("_qi").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = buckets
      .withColumn("_less", coalesce(sum(col("_c")).over(w), lit(0L)))
      .join(
        scored.groupBy(col("source")).agg(count(lit(1)).as("_ns")),
        "source")
      .select(col("source"), col("_qi"),
        expr("CAST(_less * 10000 DIV greatest(_ns - 1, 1) AS BIGINT)").as("pct_bp"))
    scored
      .join(broadcast(ranked), Seq("source", "_qi"))
      .select(col("doc_id"), col("source"), col("quality"), col("pct_bp"))
  }

  /** Gopher-style quality GATE: the rule flags of the Gopher/C4 family
    * (doc length window, mean-word-length window, alphabetic-word ratio,
    * required-stopword presence) as boolean columns plus the conjunction.
    * Every ratio test is restated in INTEGER arithmetic (`sum_len ≥ 3·n`
    * instead of `sum_len/n ≥ 3`), so there is no float anywhere — the
    * flags are exact at any scale and under any row order. Map-side only:
    * no shuffle, no vocabulary join; at 100 TB this is a pure scan. */
  def gopherRules(
      df: DataFrame,
      textCol: String = "text",
      minTokens: Int = 20,
      maxTokens: Int = 1000
  ): DataFrame = {
    val t = tokens(col(textCol))
    val n = size(t).cast("long")
    val sumLen = aggregate(t, lit(0L), (a, x) => a + length(x).cast("long"))
    val alphaN = size(filter(t, x => x.rlike("[a-zA-Z]"))).cast("long")
    val stopHits = size(array_intersect(
      array_distinct(t),
      array(lit("the"), lit("a"), lit("and"), lit("of"))))
    df.select(
      col("doc_id"),
      n.cast("int").as("n_tokens"),
      (n >= minTokens && n <= maxTokens).as("flag_len"),
      // 3 ≤ mean word length ≤ 10, cross-multiplied
      (sumLen >= lit(3L) * n && sumLen <= lit(10L) * n).as("flag_word_len"),
      // ≥ 80% of words contain an alphabetic character
      (lit(5L) * alphaN >= lit(4L) * n).as("flag_alpha"),
      // at least 2 of the required stopwords appear
      (stopHits >= 2).as("flag_stop")
    ).withColumn(
      "keep",
      col("flag_len") && col("flag_word_len") && col("flag_alpha") && col("flag_stop"))
  }

  /** BPE-ish subword statistics: a greedy regex tokenizer (≤4-char
    * alphanumeric pieces, punctuation as single tokens — the shape of a
    * byte-pair vocabulary without the learned merges) giving the
    * token-count estimate training pipelines budget by. Greedy regex
    * matching is deterministic and engine-portable, so the counts are
    * exact; `chars_per_subtok_bp` stays in integer basis points. Pure
    * map-side scan. */
  def subwordStats(df: DataFrame, textCol: String = "text"): DataFrame =
    df.select(
        col("doc_id"),
        regexp_extract_all(col(textCol), lit("[a-z0-9]{1,4}|[^a-z0-9 ]"), lit(0)).as("_st"))
      .select(
        col("doc_id"),
        size(col("_st")).as("n_subtok"),
        size(array_distinct(col("_st"))).as("n_subtok_uniq"),
        aggregate(col("_st"), lit(0L), (a, x) => a + length(x).cast("long")).as("_sl"))
      .select(
        col("doc_id"),
        col("n_subtok"),
        col("n_subtok_uniq"),
        expr("CAST(_sl * 10000 DIV n_subtok AS BIGINT)").as("chars_per_subtok_bp"))

  /** Tokenizer FERTILITY per source — subword tokens per whitespace word
    * (×10⁴), the corpus-health metric that predicts training cost per
    * document and flags sources a subword vocabulary serves badly (high
    * fertility = many pieces per word). Uses the same greedy BPE-ish
    * tokenizer as [[subwordStats]]; all ratios exact integer basis points.
    * Scale: map-side per-doc counts, ONE partial-aggregated groupBy on
    * source — a pure scan at 100 TB. */
  def tokenFertility(df: DataFrame, textCol: String = "text"): DataFrame =
    df.select(
        col("source"),
        size(tokens(col(textCol))).cast("long").as("_w"),
        regexp_extract_all(col(textCol), lit("[a-z0-9]{1,4}|[^a-z0-9 ]"), lit(0)).as("_st"))
      .select(
        col("source"),
        col("_w"),
        size(col("_st")).cast("long").as("_s"),
        aggregate(col("_st"), lit(0L), (a, x) => a + length(x).cast("long")).as("_sl"))
      .groupBy(col("source"))
      .agg(sum(col("_w")).as("n_words"), sum(col("_s")).as("n_subtok"),
        sum(col("_sl")).as("_slt"))
      .select(
        col("source"),
        col("n_words"),
        col("n_subtok"),
        expr("CAST(n_subtok * 10000 DIV n_words AS BIGINT)").as("fertility_bp"),
        expr("CAST(_slt * 10000 DIV n_subtok AS BIGINT)").as("chars_per_subtok_bp"))

  /** Pairwise vocabulary overlap between corpus sources — the cross-source
    * contamination/diversity dashboard (which feeds mixture weighting):
    * Jaccard of the distinct-term sets of every source pair, in exact
    * integer basis points (`inter·10000 DIV union`) so the matrix is
    * reproducible bit-for-bit.
    *
    * Scale shape: per-doc `array_distinct` prunes the explode BEFORE the
    * (source, term) distinct shuffle; the self-join keys on `term`, so a
    * term shared by all S sources contributes at most S² rows — bounded by
    * the vocabulary × S², never by corpus size; per-source sizes broadcast.
    */
  def sourceVocabOverlap(df: DataFrame, textCol: String = "text"): DataFrame = {
    val vocab = df
      .select(col("source"), explode(array_distinct(tokens(col(textCol)))).as("term"))
      .distinct()
    val sizes = vocab.groupBy(col("source")).agg(count(lit(1)).as("vsize"))
    val inter = vocab
      .select(col("source").as("src_a"), col("term"))
      .join(vocab.select(col("source").as("src_b"), col("term")), Seq("term"))
      .filter(col("src_a") < col("src_b"))
      .groupBy(col("src_a"), col("src_b"))
      .agg(count(lit(1)).as("inter_sz"))
    inter
      .join(broadcast(sizes.select(col("source").as("src_a"), col("vsize").as("va"))), Seq("src_a"))
      .join(broadcast(sizes.select(col("source").as("src_b"), col("vsize").as("vb"))), Seq("src_b"))
      .select(
        col("src_a"),
        col("src_b"),
        col("inter_sz"),
        (col("va") + col("vb") - col("inter_sz")).as("union_sz"),
        expr("CAST(inter_sz * 10000 DIV (va + vb - inter_sz) AS BIGINT)").as("jaccard_bp"))
  }

  /** Per-source token-distribution DRIFT from the corpus — the
    * domain-shift / mixture-monitoring statistic a training pipeline
    * watches when a new crawl source lands: total-variation distance
    * between each source's unigram distribution p_s and the whole-corpus
    * distribution p, held EXACT as integer rationals (the repo contract —
    * no float p whose summation order could flip a reported bp):
    *
    *   TV(p_s, p)·2·N_s·N = Σ_{t∈V_s} |c_st·N − c_t·N_s|
    *                        + (N − Σ_{t∈V_s} c_t)·N_s
    *
    * (the second term is the mass of terms the source never uses). Output
    * `tv_bp = TVnum·10⁴ DIV (2·N_s·N)` — 0 means the source mirrors the
    * corpus mix, 10⁴ means disjoint vocabulary.
    *
    * Scale shape: one (source, term) shuffle builds c_st; corpus counts
    * c_t roll up FROM c_st (terms ≪ tokens — the corpus is never
    * re-scanned); per-source totals and the corpus total broadcast. The
    * driver-side scalar N is one tiny aggregate. */
  def sourceVocabDrift(df: DataFrame, textCol: String = "text"): DataFrame = {
    val st = df
      .select(col("source"), explode(tokens(col(textCol))).as("term"))
      .groupBy(col("source"), col("term"))
      .agg(count(lit(1)).as("c_st"))
    val ct = st.groupBy(col("term")).agg(sum(col("c_st")).as("c_t"))
    val ns = st.groupBy(col("source")).agg(sum(col("c_st")).as("n_s"))
    val nTotal = ns.agg(sum(col("n_s"))).head().getLong(0)
    st
      .join(ct, "term")
      .join(broadcast(ns), "source")
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_terms"),
        max(col("n_s")).as("n_s"),
        sum(abs(col("c_st") * lit(nTotal) - col("c_t") * col("n_s"))).as("inn"),
        sum(col("c_t")).as("cov"))
      .select(
        col("source"),
        col("n_terms"),
        expr(s"CAST((inn + ($nTotal - cov) * n_s) * 10000 DIV (2 * n_s * $nTotal) AS BIGINT)")
          .as("tv_bp"))
  }

  /** Intra-document repetition stats — the Gopher-family repetition rules
    * (top-n-gram fraction, duplicate-n-gram fraction) used to drop
    * boilerplate/templated docs from training corpora:
    *
    *   - `top_bigram_frac`: occurrences of the doc's most frequent token
    *     bigram / total bigram occurrences;
    *   - `dup_trigram_frac`: fraction of trigram occurrences whose trigram
    *     appears more than once in the doc.
    *
    * Shape: explode + two-level groupBy rather than per-row HOF counting —
    * the (doc_id, gram) keys partial-aggregate map-side, work distributes
    * across cores for arbitrarily long documents, and no per-row O(n·u)
    * nested loop enters codegen. Docs with < 3 tokens are excluded (no
    * trigrams exist). */
  def repetitionStats(df: DataFrame, textCol: String = "text"): DataFrame = {
    val t = tokens(col(textCol))
    val docs = df.select(col("doc_id"), t.as("t")).filter(size(col("t")) >= 3)
    def gramFrame(n: Int): DataFrame =
      docs
        .select(col("doc_id"), explode(shingles(col("t"), n)).as("g"))
        .groupBy(col("doc_id"), col("g"))
        .agg(count(lit(1)).as("c"))
    val top2 = gramFrame(2)
      .groupBy(col("doc_id"))
      .agg(round(max(col("c")).cast("double") / sum(col("c")).cast("double"), 4)
        .as("top_bigram_frac"))
    val dup3 = gramFrame(3)
      .groupBy(col("doc_id"))
      .agg(round(
        sum(when(col("c") > 1, col("c")).otherwise(lit(0L))).cast("double") /
          sum(col("c")).cast("double"), 4).as("dup_trigram_frac"))
    top2.join(dup3, "doc_id")
  }

  /** HALF_UP mean of an integer-scaled sum, in exact integer arithmetic.
    * `sumScaled` is the sum pre-multiplied by 10^scale (an exact LONG);
    * the rounded mean at `scale` decimals is sign(S)·((2·|S| + n) div (2·n)),
    * and only the final rescale touches DOUBLE — dividing an exact integer
    * by 10^scale is one correctly-rounded IEEE op, identical in any engine.
    * (Rounding a double quotient instead is engine-dependent: Spark rounds
    * the shortest decimal rep, DuckDB the binary value — boundary quotients
    * …xx5 round apart. This was round 4's only red oracle row.) */
  private[graft] def halfUpMeanScaled(sumScaled: Column, n: Column, scale: Int): Column =
    halfUpMeanScaledLong(sumScaled, n).cast("double") / lit(math.pow(10d, scale))

  /** The BIGINT core of [[halfUpMeanScaled]]: the half-up rounded mean at
    * the sum's own scale, as an exact LONG — no double ever exists. Used
    * directly by dashboards whose hash contract must be integer-only
    * end-to-end (any engine, any build, any libm agrees on int64). */
  private[graft] def halfUpMeanScaledLong(sumScaled: Column, n: Column): Column = {
    val s = sumScaled.cast("long")
    val nn = n.cast("long")
    val total = abs(s) * lit(2L) + nn
    val twoN = nn * lit(2L)
    // total - pmod is an exact multiple of twoN, so the double division is
    // exact (quotient < 2^53) — no fp error before the cast back to long.
    val r = ((total - pmod(total, twoN)) / twoN).cast("long")
    // sign: r is 0 whenever s is 0, so the otherwise(1) branch is safe
    (when(s < 0, lit(-1L)).otherwise(lit(1L)) * r).cast("long")
  }

  /** Per-source corpus dashboard: the monitoring aggregation a crawl
    * pipeline runs per ingest — document/token volumes, mean quality, mean
    * length, and the language-ID agreement rate against the labeled lang
    * column, one row per source.
    *
    * Shape: every per-doc metric is inline column arithmetic (no joins
    * between metric frames), then ONE partial-aggregated groupBy on
    * source. Per-doc quality is 4dp-rounded then scaled to an exact LONG so
    * the aggregate is exact and order-independent — fp summation order
    * (which differs across partitionings) can never flip the reported mean —
    * and the means are REPORTED as scaled BIGINTs (`avg_quality_e4`,
    * `avg_chars_e2`, `langid_agreement_e4`): every column of the dashboard
    * is int64, so the result is bit-identical under any engine or build —
    * no double ever reaches the consumer's hash. */
  def corpusSourceStats(df: DataFrame): DataFrame =
    renderSourceStats(corpusSourceStatsSums(df))

  /** The five raw per-source EXACT sums behind [[corpusSourceStats]] —
    * exposed as its own dashboard so a consumer can audit exactly which
    * stage (per-doc metric vs final render) any discrepancy lives in. */
  def corpusSourceStatsSums(df: DataFrame): DataFrame =
    sourceStatsPerDoc(df)
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        sum(col("qi")).as("sum_qi"),
        sum(col("n_chars")).as("sum_chars"),
        sum(col("lang_hit")).as("lang_hits"))

  /** Render the per-source EXACT sums into the dashboard means — the one
    * place division happens, in integer half-up arithmetic, reported at
    * the scaled-integer contract (`*_e4` = value·10⁴, `*_e2` = value·10²)
    * so the whole row is int64. Split out so the STREAMING twin (whose
    * state carries the same five sums across micro-batches) renders
    * identically. */
  private[graft] def renderSourceStats(grouped: DataFrame): DataFrame =
    grouped.select(
      col("source"),
      col("n_docs"),
      col("total_tokens"),
      halfUpMeanScaledLong(col("sum_qi"), col("n_docs")).as("avg_quality_e4"),
      halfUpMeanScaledLong(col("sum_chars") * lit(100L), col("n_docs")).as("avg_chars_e2"),
      halfUpMeanScaledLong(col("lang_hits") * lit(10000L), col("n_docs"))
        .as("langid_agreement_e4"))

  /** Per-document metric projection feeding [[corpusSourceStats]] — all
    * values exact longs (quality 4dp-rounded then scaled), so any
    * grouping/merging order yields identical sums. */
  private[graft] def sourceStatsPerDoc(df: DataFrame): DataFrame = {
    val t = tokens(col("text"))
    // All five stopword-hit ratios share the same denominator len(t), so the
    // argmax over ratios equals the argmax over the raw integer hit-counts —
    // pure 64-bit comparisons, no doubles for any engine to round apart.
    val en = size(filter(t, x => x === "the" || x === "a" || x === "of")).cast("long")
    val de = size(filter(t, x => x === "der" || x === "die" || x === "das")).cast("long")
    val fr = size(filter(t, x => x === "le" || x === "la" || x === "les")).cast("long")
    val es = size(filter(t, x => x === "el" || x === "los" || x === "una")).cast("long")
    val zh = size(filter(t, x => x === "de" || x === "shi" || x === "le")).cast("long")
    val best = greatest(en, de, fr, es, zh)
    val pred = when(en === best, "en")
      .when(de === best, "de")
      .when(fr === best, "fr")
      .when(es === best, "es")
      .otherwise("zh")
    df.select(
      col("source"),
      size(t).cast("long").as("n_tokens"),
      qualityQi(t).as("qi"),
      col("n_chars"),
      when(pred === col("lang"), 1L).otherwise(0L).as("lang_hit"))
  }

  /** Source × language quality CROSSTAB — mean 4dp quality per (source,
    * labeled lang) as one wide row per source: the two-axis dashboard view
    * next to [[corpusSourceStats]]. Conditional aggregation (one groupBy,
    * map-side partials — the portable pivot that never needs a distinct
    * pass over the pivot column); means follow the integer half-up
    * contract, empty cells are NULL. */
  def qualityByLang(
      df: DataFrame,
      langs: Seq[String] = Seq("en", "de", "fr", "es", "zh")
  ): DataFrame = {
    val scored = df.select(
      col("source"),
      col("lang"),
      qualityQi(tokens(col("text"))).as("qi"))
    val aggs = langs.flatMap { l =>
      Seq(
        sum(when(col("lang") === l, col("qi")).otherwise(lit(0L))).as(s"_s_$l"),
        sum(when(col("lang") === l, 1L).otherwise(0L)).as(s"_n_$l"))
    }
    val out = langs.map { l =>
      when(col(s"_n_$l") > 0,
        halfUpMeanScaled(col(s"_s_$l"), col(s"_n_$l"), 4)).as(s"q_$l")
    }
    scored
      .groupBy(col("source"))
      .agg(aggs.head, aggs.tail: _*)
      .select(col("source") +: out: _*)
  }

  /** Vocabulary GROWTH curve (Heaps' law view): new distinct terms
    * introduced per doc_id decile, with the cumulative count — the
    * diminishing-returns read a mixture designer takes before adding more
    * of the same source. A term's introduction point is its min doc_id
    * (one term-keyed aggregate); deciles are integer id-range buckets, so
    * the curve is exact under any partitioning; the cumulative window runs
    * over 10 rows. */
  def vocabGrowth(
      df: DataFrame,
      buckets: Int = 10,
      n: Int = 3,
      textCol: String = "text"
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // n-gram vocabulary (n = 1 recovers plain terms): on a small closed
    // unigram vocabulary the curve collapses to one bucket; n-grams give
    // the Heaps-law growth the metric exists to show
    val terms = df.select(
      col("doc_id"),
      explode(array_distinct(shingles(tokens(col(textCol)), n))).as("term"))
    val first = terms.groupBy(col("term")).agg(min(col("doc_id")).as("_fd"))
    val maxId = df.agg(max(col("doc_id")).as("_mx"))
    val perBucket = first
      .crossJoin(broadcast(maxId))
      .selectExpr(s"CAST(least(_fd * $buckets DIV (_mx + 1), ${buckets - 1}) AS INT) AS bucket")
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("new_terms"))
    perBucket
      .withColumn(
        "cum_terms",
        sum(col("new_terms")).over(
          Window.orderBy(col("bucket")).rowsBetween(Window.unboundedPreceding, 0)))
      .select(col("bucket"), col("new_terms"), col("cum_terms"))
  }

  /** Language-ID n-gram heuristic: score per language = fraction of tokens
    * hitting that language's stop list; argmax with deterministic tie order
    * (en > de > fr > es > zh). (The synthetic corpus draws all languages
    * from one vocabulary, so this demonstrates the operator shape — the
    * scoring, not the corpus, is what the oracle checks.) */
  def langId(df: DataFrame, textCol: String = "text"): DataFrame = {
    val t = tokens(col(textCol))
    val n = size(t).cast("double")
    def ratio(words: Seq[String]): Column =
      size(filter(t, x => words.map(x === _).reduce(_ || _))).cast("double") / n
    val en = ratio(Seq("the", "a", "of"))
    val de = ratio(Seq("der", "die", "das"))
    val fr = ratio(Seq("le", "la", "les"))
    val es = ratio(Seq("el", "los", "una"))
    val zh = ratio(Seq("de", "shi", "le"))
    val best = greatest(en, de, fr, es, zh)
    df.select(
      col("doc_id"),
      when(en === best, "en")
        .when(de === best, "de")
        .when(fr === best, "fr")
        .when(es === best, "es")
        .otherwise("zh")
        .as("pred_lang"),
      round(best, 4).as("lang_score")
    )
  }

  /** Unigram-LM rarity score — the integer-exact surrogate for the
    * CCNet/KenLM perplexity filter a training pipeline runs before
    * quality bucketing: per document, the tf-weighted mean of each
    * term's inverse corpus frequency `total_tokens·10⁴ DIV count(term)`
    * (large = the document is built from corpus-rare vocabulary).
    * A true per-token `-log p` differs in the last ulp across libm
    * implementations, which no round-then-hash contract can absorb —
    * the rational surrogate is monotone in the same per-token
    * probabilities and exact 64-bit arithmetic on any engine.
    *
    * Shape at 100 TB: tokenize → one (doc_id, term) partial-aggregated
    * shuffle, one term-keyed vocabulary aggregate, one term-keyed join
    * (text itself never moves past the tokenizer), one final doc_id
    * roll-up. The corpus-total is a single broadcast row. */
  def rarityScore(df: DataFrame, textCol: String = "text"): DataFrame = {
    val tf = df
      .select(col("doc_id"), explode(tokens(col(textCol))).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val vocab = tf.groupBy(col("term")).agg(sum(col("tf")).as("cnt"))
    val total = vocab.agg(sum(col("cnt")).as("total"))
    def floorDiv(num: Column, den: Column): Column =
      ((num - pmod(num, den)) / den).cast("long")
    val rarity = floorDiv(col("total") * lit(10000L), col("cnt"))
    tf.join(vocab, "term")
      .crossJoin(broadcast(total))
      .select(col("doc_id"), col("tf"), (col("tf") * rarity).as("w"))
      .groupBy(col("doc_id"))
      .agg(
        sum(col("tf")).cast("int").as("n_tokens"),
        floorDiv(sum(col("w")), sum(col("tf"))).as("mean_rarity"))
  }

  /** Head/mid/tail vocabulary-coverage buckets — the CCNet-style corpus
    * positioning of each document: what fraction of its tokens (integer
    * basis points) fall in the corpus head vocabulary (top `head` terms
    * by total tf, ties term-asc), the mid band (next `mid` terms), and
    * the long tail (everything else). Documents written almost entirely
    * from head vocabulary are boilerplate-ish; tail-heavy ones are rare
    * or noisy — the two-sided screen a mixture designer reads.
    *
    * Shape: the head+mid term list is a bounded `orderBy().limit()`
    * (TakeOrderedAndProject — per-partition top-N, never a global window
    * sort), its ranks recovered with the broadcast precedence self-join,
    * then broadcast into the per-doc tf frame; bucket sums are one
    * doc-keyed aggregate. */
  def vocabCoverage(
      df: DataFrame,
      head: Int = 10,
      mid: Int = 20,
      textCol: String = "text"
  ): DataFrame = {
    val tf = df
      .select(col("doc_id"), explode(tokens(col(textCol))).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val vocab = tf.groupBy(col("term")).agg(sum(col("tf")).as("cnt"))
    val top = vocab.orderBy(col("cnt").desc, col("term").asc).limit(head + mid)
    val prior = top.select(col("term").as("t2"), col("cnt").as("c2"))
    val ranked = top
      .join(
        broadcast(prior),
        col("c2") > col("cnt") || (col("c2") === col("cnt") && col("t2") < col("term")),
        "left")
      .groupBy(col("term"), col("cnt"))
      .agg((count(col("t2")) + 1).cast("int").as("rnk"))
    val bucketed = tf
      .join(broadcast(ranked.select(col("term"), col("rnk"))), Seq("term"), "left")
      .select(
        col("doc_id"),
        col("tf"),
        when(col("rnk") <= head, col("tf")).otherwise(0L).as("h"),
        when(col("rnk") > head && col("rnk") <= head + mid, col("tf"))
          .otherwise(0L)
          .as("m"))
    def bp(part: Column, n: Column): Column =
      ((part * lit(10000L) - pmod(part * lit(10000L), n)) / n).cast("long")
    bucketed
      .groupBy(col("doc_id"))
      .agg(
        sum(col("tf")).cast("int").as("n_tokens"),
        bp(sum(col("h")), sum(col("tf"))).as("head_bp"),
        bp(sum(col("m")), sum(col("tf"))).as("mid_bp"),
        bp(sum(col("tf")) - sum(col("h")) - sum(col("m")), sum(col("tf")))
          .as("tail_bp"))
  }

  /** Vocabulary frequency spectrum — for each occurrence count `cnt`,
    * how many types have it and what share of types / token mass they
    * carry (integer basis points): the Zipf-curve view a corpus
    * linguist reads (hapax share = the `cnt = 1` row). Same per-count
    * bucket collapse as [[nucleusVocab]]: two hash aggregates, output
    * rows bounded by |distinct tf values| ≪ |vocab|. */
  def freqSpectrum(df: DataFrame, textCol: String = "text"): DataFrame = {
    val vocab = df
      .select(explode(tokens(col(textCol))).as("term"))
      .groupBy(col("term"))
      .agg(count(lit(1)).as("cnt"))
    val buckets = vocab
      .groupBy(col("cnt"))
      .agg(count(lit(1)).as("n_types"))
    val totals = buckets.agg(
      sum(col("n_types")).as("total_types"),
      sum(col("cnt") * col("n_types")).as("total_mass"))
    def bp(num: Column, den: Column): Column =
      ((num * lit(10000L) - pmod(num * lit(10000L), den)) / den).cast("long")
    buckets
      .crossJoin(broadcast(totals))
      .select(
        col("cnt"),
        col("n_types"),
        bp(col("n_types"), col("total_types")).as("types_bp"),
        bp(col("cnt") * col("n_types"), col("total_mass")).as("mass_bp"))
  }

  /** PMI bigram collocations — phrase mining / tokenizer-merge signal:
    * the top-k adjacent token pairs by pointwise mutual information,
    * restated as the exact rational surrogate
    * `c_ab · N_uni · 10⁴ DIV (c_a · c_b)` (PMI's log is monotone in
    * that ratio; the global constants only shift the scale, so the
    * ranking is PMI's ranking and the score is exact 64-bit integer
    * arithmetic on both engines). `minCount` drops noise pairs the way
    * every collocation pipeline does.
    *
    * Shape at 100 TB: bigram and unigram counts are two hash-keyed
    * partial-aggregated shuffles off the same tokenized scan; the two
    * unigram joins key on term; the top-k is a bounded
    * `orderBy().limit()` (TakeOrderedAndProject) with rank recovered by
    * the broadcast precedence self-join — no global window. (Counts
    * here fit longs; past ~10¹³ tokens the score product needs the
    * DECIMAL(38) widening.) */
  def pmiBigrams(
      df: DataFrame,
      minCount: Int = 5,
      k: Int = 20,
      textCol: String = "text"
  ): DataFrame = {
    val t = tokens(col(textCol))
    val bi = df
      .filter(size(t) >= 2)
      .select(explode(shingles(t, 2)).as("bg"))
      .groupBy(col("bg"))
      .agg(count(lit(1)).as("c_ab"))
      .filter(col("c_ab") >= minCount)
    val uni = df
      .select(explode(tokens(col(textCol))).as("term"))
      .groupBy(col("term"))
      .agg(count(lit(1)).as("cnt"))
    val totalUni = uni.agg(sum(col("cnt")).as("n_uni"))
    def floorDiv(num: Column, den: Column): Column =
      ((num - pmod(num, den)) / den).cast("long")
    val scored = bi
      .select(
        col("bg"),
        col("c_ab"),
        split(col("bg"), " ").getItem(0).as("ta"),
        split(col("bg"), " ").getItem(1).as("tb"))
      .join(uni.select(col("term").as("ta"), col("cnt").as("c_a")), "ta")
      .join(uni.select(col("term").as("tb"), col("cnt").as("c_b")), "tb")
      .crossJoin(broadcast(totalUni))
      .select(
        col("bg"),
        col("c_ab"),
        col("c_a"),
        col("c_b"),
        floorDiv(col("c_ab") * col("n_uni") * lit(10000L), col("c_a") * col("c_b"))
          .as("pmi_score"))
    val top = scored.orderBy(col("pmi_score").desc, col("bg").asc).limit(k)
    val prior = top.select(col("bg").as("b2"), col("pmi_score").as("s2"))
    top
      .join(
        broadcast(prior),
        col("s2") > col("pmi_score") ||
          (col("s2") === col("pmi_score") && col("b2") < col("bg")),
        "left")
      .groupBy(col("bg"), col("c_ab"), col("c_a"), col("c_b"), col("pmi_score"))
      .agg((count(col("b2")) + 1).cast("int").as("rnk"))
  }

  /** Nucleus vocabulary size — for each coverage target `p_bp` (basis
    * points of total token mass), the smallest prefix of the vocabulary
    * (ordered count-desc, term-asc) whose cumulative count reaches the
    * target, plus the exact coverage it achieves. The tokenizer-design
    * statistic: "how many types cover 90% of the corpus".
    *
    * Shape at 100 TB: the walk is NOT over terms — terms collapse into
    * per-count buckets first (`(cnt, n_terms, mass)`), and the running
    * sum runs over that tiny frame (distinct tf values ≪ vocabulary
    * size; the window is documented as bounded by that). Inside the
    * boundary bucket every term contributes the same `cnt`, so the
    * number of terms needed is `ceil(remaining/cnt)` — pure integer
    * arithmetic, no per-term scan. */
  def nucleusVocab(
      df: DataFrame,
      targetsBp: Seq[Int] = Seq(5000, 9000, 9900),
      textCol: String = "text"
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val vocab = df
      .select(explode(tokens(col(textCol))).as("term"))
      .groupBy(col("term"))
      .agg(count(lit(1)).as("cnt"))
    val buckets = vocab
      .groupBy(col("cnt"))
      .agg(count(lit(1)).as("n_terms"))
      .select(col("cnt"), col("n_terms"), (col("cnt") * col("n_terms")).as("mass"))
    // running totals over the count-bucket frame (small by construction)
    val w = Window.orderBy(col("cnt").desc).rowsBetween(Window.unboundedPreceding, 0)
    val cum = buckets.select(
      col("cnt"),
      col("n_terms"),
      col("mass"),
      sum(col("mass")).over(w).as("cum_mass"),
      sum(col("n_terms")).over(w).as("cum_terms"))
    val total = cum.agg(max(col("cum_mass")).as("total"))
    val session = df.sparkSession
    import session.implicits._
    val tdf = targetsBp.toDF("p_bp")
    def ceilDiv(num: Column, den: Column): Column =
      ((num + den - lit(1L) - pmod(num + den - lit(1L), den)) / den).cast("long")
    def floorDiv(num: Column, den: Column): Column =
      ((num - pmod(num, den)) / den).cast("long")
    val need = ceilDiv(col("p_bp").cast("long") * col("total"), lit(10000L))
    cum
      .crossJoin(broadcast(total))
      .crossJoin(broadcast(tdf))
      // the unique boundary bucket: first (in cnt-desc walk) to reach need
      .filter(col("cum_mass") >= need && col("cum_mass") - col("mass") < need)
      .select(
        col("p_bp").cast("int").as("p_bp"),
        (col("cum_terms") - col("n_terms") +
          ceilDiv(need - (col("cum_mass") - col("mass")), col("cnt"))).as("n_terms"),
        floorDiv(
          (col("cum_mass") - col("mass") +
            ceilDiv(need - (col("cum_mass") - col("mass")), col("cnt")) * col("cnt")) *
            lit(10000L),
          col("total")).as("covered_bp"))
  }
}
