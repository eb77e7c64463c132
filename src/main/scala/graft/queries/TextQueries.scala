package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.{Packing, Sampling, TextAnalysis}
import graft.sources.Tables

/** Text-analysis pipeline operators over `documents`: token counting,
  * quality scoring, language-ID heuristic, document fingerprinting.
  */
object TextQueries {

  /** DuckDB fragment: char-fold polynomial hash of a token expression. */
  private def sqlTokenHash(tok: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"list_transform(range(1, len($tok)+1), i -> CAST(ascii(substr($tok, CAST(i AS INT), 1)) AS BIGINT))), " +
      s"(h, c) -> (h * 31 + c) % ${TextAnalysis.HashP})"

  /** DuckDB fragment over a token list `t`: the INTEGER-EXACT scaled
    * quality qi = round(quality·10⁴) half-up. quality = 2·ttr − 3·stop +
    * 0.05·avgLen is the rational (40·distinct − 60·stops + Σlen)/(20·n),
    * so qi is pure 64-bit integer arithmetic — the same expression the
    * Spark side computes (TextAnalysis.qualityQi). No round(double) on
    * either engine: round-5's red oracle rows were boundary quotients
    * (…49999…/…5) that DuckDB and Java BigDecimal round apart. */
  private val qiNumSql =
    """(40 * CAST(len(list_distinct(t)) AS BIGINT)
    - 60 * CAST(len(list_filter(t, x -> x = 'a' OR x = 'the')) AS BIGINT)
    + CAST(list_sum(list_transform(t, x -> CAST(len(x) AS BIGINT))) AS BIGINT))"""
  private[queries] val qiSql =
    s"""((CASE WHEN $qiNumSql < 0 THEN -1 ELSE 1 END)
    * ((2 * abs($qiNumSql) * 10000 + 20 * len(t)) // (40 * len(t))))"""

  /** The doc_quality scoring expression (DuckDB side), shared by every
    * quality-ordered query so they cannot drift apart: the exact qi cast
    * to double and rescaled — one correctly-rounded IEEE division,
    * bit-identical to the Spark side. */
  private[queries] val qualitySql = s"(CAST($qiSql AS DOUBLE) / 10000.0)"

  /** The shared per-doc CTE behind the per-source dashboard oracles: the
    * exact-long (n_tokens, qi, n_chars, lang_hit) projection per document.
    * Both the rendered dashboard and the raw-sums probe read frame `d`, so
    * any divergence between them isolates to the final render. */
  private val sourceStatsDocCte: String = s"""WITH tok AS (
  SELECT source, lang, n_chars, string_split(text, ' ') AS t FROM documents
),
d AS (
  SELECT source, n_chars, CAST(len(t) AS BIGINT) AS n_tokens,
    CAST($qiSql AS BIGINT) AS qi,
    -- all five stopword ratios share denominator len(t): argmax over ratios
    -- == argmax over the raw BIGINT hit-counts — no doubles anywhere
    CASE WHEN (CASE
      WHEN CAST(len(list_filter(t, x -> x = 'the' OR x = 'a' OR x = 'of')) AS BIGINT) =
        greatest(CAST(len(list_filter(t, x -> x = 'the' OR x = 'a' OR x = 'of')) AS BIGINT),
                 CAST(len(list_filter(t, x -> x = 'der' OR x = 'die' OR x = 'das')) AS BIGINT),
                 CAST(len(list_filter(t, x -> x = 'le' OR x = 'la' OR x = 'les')) AS BIGINT),
                 CAST(len(list_filter(t, x -> x = 'el' OR x = 'los' OR x = 'una')) AS BIGINT),
                 CAST(len(list_filter(t, x -> x = 'de' OR x = 'shi' OR x = 'le')) AS BIGINT))
      THEN 'en'
      WHEN CAST(len(list_filter(t, x -> x = 'der' OR x = 'die' OR x = 'das')) AS BIGINT) =
        greatest(CAST(len(list_filter(t, x -> x = 'the' OR x = 'a' OR x = 'of')) AS BIGINT),
                 CAST(len(list_filter(t, x -> x = 'der' OR x = 'die' OR x = 'das')) AS BIGINT),
                 CAST(len(list_filter(t, x -> x = 'le' OR x = 'la' OR x = 'les')) AS BIGINT),
                 CAST(len(list_filter(t, x -> x = 'el' OR x = 'los' OR x = 'una')) AS BIGINT),
                 CAST(len(list_filter(t, x -> x = 'de' OR x = 'shi' OR x = 'le')) AS BIGINT))
      THEN 'de'
      WHEN CAST(len(list_filter(t, x -> x = 'le' OR x = 'la' OR x = 'les')) AS BIGINT) =
        greatest(CAST(len(list_filter(t, x -> x = 'the' OR x = 'a' OR x = 'of')) AS BIGINT),
                 CAST(len(list_filter(t, x -> x = 'der' OR x = 'die' OR x = 'das')) AS BIGINT),
                 CAST(len(list_filter(t, x -> x = 'le' OR x = 'la' OR x = 'les')) AS BIGINT),
                 CAST(len(list_filter(t, x -> x = 'el' OR x = 'los' OR x = 'una')) AS BIGINT),
                 CAST(len(list_filter(t, x -> x = 'de' OR x = 'shi' OR x = 'le')) AS BIGINT))
      THEN 'fr'
      WHEN CAST(len(list_filter(t, x -> x = 'el' OR x = 'los' OR x = 'una')) AS BIGINT) =
        greatest(CAST(len(list_filter(t, x -> x = 'the' OR x = 'a' OR x = 'of')) AS BIGINT),
                 CAST(len(list_filter(t, x -> x = 'der' OR x = 'die' OR x = 'das')) AS BIGINT),
                 CAST(len(list_filter(t, x -> x = 'le' OR x = 'la' OR x = 'les')) AS BIGINT),
                 CAST(len(list_filter(t, x -> x = 'el' OR x = 'los' OR x = 'una')) AS BIGINT),
                 CAST(len(list_filter(t, x -> x = 'de' OR x = 'shi' OR x = 'le')) AS BIGINT))
      THEN 'es'
      ELSE 'zh' END) = lang THEN 1 ELSE 0 END AS lang_hit
  FROM tok
)"""

  /** The rendered dashboard: every output column BIGINT (means reported at
    * the scaled-integer contract), so no double — whose rounding/render can
    * differ across engine builds — ever reaches the result hash. */
  private val sourceStatsSql: String = s"""$sourceStatsDocCte
SELECT source, count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
  CAST((CASE WHEN sum(qi) < 0 THEN -1 WHEN sum(qi) > 0 THEN 1 ELSE 0 END)
    * ((2 * abs(CAST(sum(qi) AS BIGINT)) + count(*)) // (2 * count(*)))
    AS BIGINT) AS avg_quality_e4,
  CAST((2 * CAST(sum(n_chars) AS BIGINT) * 100 + count(*)) // (2 * count(*))
    AS BIGINT) AS avg_chars_e2,
  CAST((2 * CAST(sum(lang_hit) AS BIGINT) * 10000 + count(*)) // (2 * count(*))
    AS BIGINT) AS langid_agreement_e4
FROM d GROUP BY source"""

  /** The raw-sums probe: the five exact BIGINT sums per source, no render
    * at all — isolates tokenization/per-doc-metric divergence from render
    * divergence. */
  private val sourceStatsSumsSql: String = s"""$sourceStatsDocCte
SELECT source, count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
  CAST(sum(qi) AS BIGINT) AS sum_qi, CAST(sum(n_chars) AS BIGINT) AS sum_chars,
  CAST(sum(lang_hit) AS BIGINT) AS lang_hits
FROM d GROUP BY source"""

  def all: Seq[GraftQuery] = Seq(
    // longest identical-consecutive-token run (the repetition gate): one
    // map-side fold over the token array — no shuffle, no window
    GraftQuery(
      "doc_max_run",
      (s, dir) => TextAnalysis.maxTokenRun(Tables.documents(s, dir)),
      Some("""WITH t AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
         unnest(range(1, len(string_split(text, ' ')) + 1)) AS i
  FROM documents
),
g AS (
  SELECT doc_id, tok, i,
         i - row_number() OVER (PARTITION BY doc_id, tok ORDER BY i) AS grp
  FROM t
),
r AS (SELECT doc_id, count(*) AS run FROM g GROUP BY doc_id, tok, grp)
SELECT doc_id, CAST(max(run) AS INT) AS max_run FROM r GROUP BY 1""")),
    // winnowing fingerprints (MOSS): min hash of every 4-window of token
    // 3-gram hashes, distinct per doc — any shared ≥6-token run yields a
    // shared fingerprint. Map-side HOFs; the exploded (doc_id, fp) pairs
    // are what a containment join downstream would shuffle (never text)
    GraftQuery(
      "doc_winnowing",
      (s, dir) => TextAnalysis.winnowingFingerprints(Tables.documents(s, dir)),
      Some(s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
hs AS (
  SELECT doc_id, list_transform(
    CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
         ELSE list_transform(range(1, len(t) - 1), i -> array_to_string(t[i:i+2], ' ')) END,
    s -> ${sqlTokenHash("s")}) AS h
  FROM toks
),
fp AS (
  SELECT doc_id, list_distinct(list_transform(range(1, greatest(len(h) - 3, 1) + 1),
    j -> list_min(h[j:j+3]))) AS fps
  FROM hs
)
SELECT doc_id, unnest(fps) AS fp FROM fp""")),
    // token counting (whitespace tokenizer + distinct + mean length)
    GraftQuery(
      "doc_token_stats",
      (s, dir) => TextAnalysis.tokenStats(Tables.documents(s, dir)),
      Some("""SELECT doc_id, CAST(len(t) AS INT) AS n_tokens,
CAST(len(list_distinct(t)) AS INT) AS n_uniq,
round(list_sum(list_transform(t, x -> CAST(len(x) AS DOUBLE))) / len(t), 4) AS avg_token_len
FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)""")),
    // quality scoring (type-token ratio, stopword ratio, mean token length)
    GraftQuery(
      "doc_quality",
      (s, dir) => TextAnalysis.qualityScore(Tables.documents(s, dir)),
      Some(s"""SELECT doc_id, $qualitySql AS quality
FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)""")),
    // per-source quality-percentile calibration: pct_bp = strictly-lower
    // same-source share over (n_s − 1) — thresholds become source-relative
    // (raw scores aren't comparable across domains). Plan walks (source,
    // 4dp-quality) buckets, never a per-doc window over the corpus
    GraftQuery(
      "doc_quality_pct",
      (s, dir) => TextAnalysis.qualityPercentile(Tables.documents(s, dir)),
      Some(s"""WITH d AS (
  SELECT doc_id, source, $qualitySql AS quality
  FROM (SELECT doc_id, source, string_split(text, ' ') AS t FROM documents)
),
n AS (SELECT source, count(*) AS n_s FROM d GROUP BY 1)
SELECT d.doc_id, d.source, d.quality,
  CAST((rank() OVER (PARTITION BY d.source ORDER BY d.quality ASC) - 1) * 10000
    // greatest(n.n_s - 1, 1) AS BIGINT) AS pct_bp
FROM d JOIN n ON n.source = d.source""")),
    // language-ID heuristic (stop-list hit ratios, deterministic tie order)
    GraftQuery(
      "doc_lang_id",
      (s, dir) => TextAnalysis.langId(Tables.documents(s, dir)),
      Some("""WITH r AS (
  SELECT doc_id,
    CAST(len(list_filter(t, x -> x = 'the' OR x = 'a' OR x = 'of')) AS DOUBLE) / len(t) AS en,
    CAST(len(list_filter(t, x -> x = 'der' OR x = 'die' OR x = 'das')) AS DOUBLE) / len(t) AS de,
    CAST(len(list_filter(t, x -> x = 'le' OR x = 'la' OR x = 'les')) AS DOUBLE) / len(t) AS fr,
    CAST(len(list_filter(t, x -> x = 'el' OR x = 'los' OR x = 'una')) AS DOUBLE) / len(t) AS es,
    CAST(len(list_filter(t, x -> x = 'de' OR x = 'shi' OR x = 'le')) AS DOUBLE) / len(t) AS zh
  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
)
SELECT doc_id,
  CASE WHEN en = greatest(en, de, fr, es, zh) THEN 'en'
       WHEN de = greatest(en, de, fr, es, zh) THEN 'de'
       WHEN fr = greatest(en, de, fr, es, zh) THEN 'fr'
       WHEN es = greatest(en, de, fr, es, zh) THEN 'es'
       ELSE 'zh' END AS pred_lang,
  round(greatest(en, de, fr, es, zh), 4) AS lang_score
FROM r""")),
    // source × language quality crosstab: one wide row per source, mean
    // 4dp quality per labeled lang via conditional aggregation (the
    // portable pivot — one groupBy, no distinct pass); integer half-up
    // means, NULL empty cells
    GraftQuery(
      "corpus_quality_by_lang",
      (s, dir) => TextAnalysis.qualityByLang(Tables.documents(s, dir)),
      Some(s"""WITH d AS (
  SELECT source, lang, CAST($qiSql AS BIGINT) AS qi
  FROM (SELECT source, lang, string_split(text, ' ') AS t FROM documents)
),
cells AS (SELECT source, lang, sum(qi) AS sq, count(*) AS n FROM d GROUP BY 1, 2),
m AS (
  SELECT source, lang,
    CAST((CASE WHEN sq < 0 THEN -1 WHEN sq > 0 THEN 1 ELSE 0 END)
      * ((2 * abs(CAST(sq AS BIGINT)) + n) // (2 * n)) AS DOUBLE) / 10000.0 AS mean
  FROM cells
)
SELECT source,
  max(CASE WHEN lang = 'en' THEN mean END) AS q_en,
  max(CASE WHEN lang = 'de' THEN mean END) AS q_de,
  max(CASE WHEN lang = 'fr' THEN mean END) AS q_fr,
  max(CASE WHEN lang = 'es' THEN mean END) AS q_es,
  max(CASE WHEN lang = 'zh' THEN mean END) AS q_zh
FROM m GROUP BY 1""")),
    // vocabulary growth curve (Heaps' law view): new terms per doc-id
    // decile + cumulative — diminishing returns per additional slice of
    // the same source; one term-keyed aggregate, 10-row window
    GraftQuery(
      "vocab_growth",
      (s, dir) => TextAnalysis.vocabGrowth(Tables.documents(s, dir)),
      Some("""WITH tk AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
t AS (
  SELECT doc_id, unnest(list_distinct(
    CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
         ELSE list_transform(range(1, len(t) - 1), i -> array_to_string(t[i:i+2], ' ')) END)) AS term
  FROM tk
),
f AS (SELECT term, min(doc_id) AS fd FROM t GROUP BY 1),
mx AS (SELECT max(doc_id) AS m FROM documents),
pb AS (
  SELECT CAST(least(fd * 10 // (m + 1), 9) AS INT) AS bucket, count(*) AS new_terms
  FROM f CROSS JOIN mx GROUP BY 1
)
SELECT bucket, new_terms,
  CAST(sum(new_terms) OVER (ORDER BY bucket
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_terms
FROM pb""")),
    // deterministic curriculum ordering: quality-descending, content-hash
    // shuffled within equal quality — the reproducible easy-first training
    // permutation; two-phase (per-4dp-bucket counts → broadcast offsets →
    // in-bucket ranks), no global sort
    GraftQuery(
      "corpus_curriculum_rank",
      (s, dir) => Sampling.curriculumRank(Tables.documents(s, dir)),
      Some(s"""WITH keyed AS (
  SELECT doc_id, CAST($qiSql AS BIGINT) AS qi, ${sqlTokenHash("md5(text)")} AS k
  FROM (SELECT doc_id, text, string_split(text, ' ') AS t FROM documents)
)
SELECT doc_id,
  CAST(row_number() OVER (ORDER BY qi DESC, k ASC, doc_id ASC) AS BIGINT) AS curriculum_rank
FROM keyed""")),
    // Cohen's kappa of the language-ID heuristic vs the labeled lang
    // column — chance-corrected agreement next to the dashboard's raw
    // rate. Exact integer rational off one tiny confusion-matrix
    // aggregate; κ in basis points
    GraftQuery(
      "eval_langid_kappa",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val pairs = docs
          .join(TextAnalysis.langId(docs), "doc_id")
          .select(col("lang"), col("pred_lang"))
        graft.operators.Eval.cohenKappa(pairs, "lang", "pred_lang")
      },
      Some("""WITH r AS (
  SELECT doc_id, lang,
    CAST(len(list_filter(t, x -> x = 'the' OR x = 'a' OR x = 'of')) AS DOUBLE) / len(t) AS en,
    CAST(len(list_filter(t, x -> x = 'der' OR x = 'die' OR x = 'das')) AS DOUBLE) / len(t) AS de,
    CAST(len(list_filter(t, x -> x = 'le' OR x = 'la' OR x = 'les')) AS DOUBLE) / len(t) AS fr,
    CAST(len(list_filter(t, x -> x = 'el' OR x = 'los' OR x = 'una')) AS DOUBLE) / len(t) AS es,
    CAST(len(list_filter(t, x -> x = 'de' OR x = 'shi' OR x = 'le')) AS DOUBLE) / len(t) AS zh
  FROM (SELECT doc_id, lang, string_split(text, ' ') AS t FROM documents)
),
pr AS (
  SELECT lang AS l,
    CASE WHEN en = greatest(en, de, fr, es, zh) THEN 'en'
         WHEN de = greatest(en, de, fr, es, zh) THEN 'de'
         WHEN fr = greatest(en, de, fr, es, zh) THEN 'fr'
         WHEN es = greatest(en, de, fr, es, zh) THEN 'es'
         ELSE 'zh' END AS p
  FROM r
),
conf AS (SELECT l, p, count(*) AS c FROM pr GROUP BY 1, 2),
rowm AS (SELECT l, sum(c) AS rc FROM conf GROUP BY 1),
colm AS (SELECT p, sum(c) AS cc FROM conf GROUP BY 1),
pe AS (
  SELECT coalesce(sum(rc * cc), 0) AS pe_n2
  FROM rowm JOIN colm ON colm.p = rowm.l
),
ag AS (
  SELECT CAST(sum(c) AS BIGINT) AS n,
         CAST(sum(CASE WHEN l = p THEN c ELSE 0 END) AS BIGINT) AS hits
  FROM conf
)
SELECT n, hits,
  CAST(CASE WHEN n * n = pe_n2 THEN 10000
       ELSE (hits * n - pe_n2) * 10000 // (n * n - pe_n2) END AS BIGINT) AS kappa_bp
FROM ag CROSS JOIN pe""")),
    // TF-IDF characteristic terms per document (keyword extraction — the
    // classic corpus-indexing feature a training pipeline derives before
    // vocab pruning / topic bucketing). Integer-scaled rational idf
    // surrogate (N+1)/(df+1) keeps the score exact 64-bit arithmetic on
    // both engines — ln differs in the last ulp across libms, which a
    // round-then-rank contract cannot absorb at ranking boundaries
    GraftQuery(
      "doc_tfidf_terms",
      (s, dir) => TextAnalysis.tfidfTopTerms(Tables.documents(s, dir), k = 3),
      Some("""WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
n AS (SELECT count(DISTINCT doc_id) AS n FROM documents),
dfreq AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks GROUP BY 1)
SELECT doc_id, term, score, rnk FROM (
  SELECT tf.doc_id AS doc_id, tf.term AS term,
    CAST(tf.tf * (n.n + 1) * 10000 // (dfreq.df + 1) AS BIGINT) AS score,
    CAST(row_number() OVER (PARTITION BY tf.doc_id
      ORDER BY tf.tf * (n.n + 1) * 10000 // (dfreq.df + 1) DESC, tf.term ASC) AS INT) AS rnk
  FROM tf JOIN dfreq ON dfreq.term = tf.term CROSS JOIN n
) WHERE rnk <= 3""")),
    // Gopher-family repetition rules: top-bigram fraction + duplicate-
    // Gopher/C4-family quality gate: rule flags in pure integer
    // arithmetic (cross-multiplied ratio tests — no float anywhere), so
    // the booleans are exact under any row order; map-side only
    GraftQuery(
      "doc_gopher_rules",
      (s, dir) => TextAnalysis.gopherRules(Tables.documents(s, dir)),
      Some("""SELECT doc_id,
  CAST(len(t) AS INT) AS n_tokens,
  len(t) >= 20 AND len(t) <= 1000 AS flag_len,
  sum_len >= 3 * len(t) AND sum_len <= 10 * len(t) AS flag_word_len,
  5 * alpha_n >= 4 * len(t) AS flag_alpha,
  stop_hits >= 2 AS flag_stop,
  (len(t) >= 20 AND len(t) <= 1000
   AND sum_len >= 3 * len(t) AND sum_len <= 10 * len(t)
   AND 5 * alpha_n >= 4 * len(t) AND stop_hits >= 2) AS keep
FROM (
  SELECT doc_id, t,
    CAST(list_sum(list_transform(t, x -> CAST(len(x) AS BIGINT))) AS BIGINT) AS sum_len,
    CAST(len(list_filter(t, x -> regexp_matches(x, '[a-zA-Z]'))) AS BIGINT) AS alpha_n,
    len(list_intersect(list_distinct(t), ['the', 'a', 'and', 'of'])) AS stop_hits
  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
)""")),
    // trigram fraction per document (templated/boilerplate doc signal)
    GraftQuery(
      "doc_repetition",
      (s, dir) => TextAnalysis.repetitionStats(Tables.documents(s, dir)),
      Some("""WITH f AS (
  SELECT doc_id, t FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
  WHERE len(t) >= 3
),
bg AS (
  SELECT doc_id, unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])) AS g FROM f
),
bgc AS (SELECT doc_id, g, count(*) AS c FROM bg GROUP BY 1, 2),
bstat AS (
  SELECT doc_id, round(CAST(max(c) AS DOUBLE) / CAST(sum(c) AS DOUBLE), 4) AS top_bigram_frac
  FROM bgc GROUP BY 1
),
tg AS (
  SELECT doc_id, unnest(list_transform(range(1, len(t)-1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS g FROM f
),
tgc AS (SELECT doc_id, g, count(*) AS c FROM tg GROUP BY 1, 2),
tstat AS (
  SELECT doc_id,
    round(CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS DOUBLE) / CAST(sum(c) AS DOUBLE), 4) AS dup_trigram_frac
  FROM tgc GROUP BY 1
)
SELECT b.doc_id AS doc_id, b.top_bigram_frac, t.dup_trigram_frac
FROM bstat b JOIN tstat t ON b.doc_id = t.doc_id""")),
    // per-source corpus dashboard: volumes, mean quality/length, lang-ID
    // agreement — one partial-aggregated groupBy, per-doc metrics inline
    // (decimal-summed quality keeps the mean order-independent)
    GraftQuery(
      "corpus_source_stats",
      (s, dir) => TextAnalysis.corpusSourceStats(Tables.documents(s, dir)),
      Some(sourceStatsSql)),
    // raw-sums probe for the dashboard above: the five exact BIGINT sums
    // per source with NO rendering — bisects any dashboard divergence into
    // per-doc tokenization/metric vs final integer render
    GraftQuery(
      "corpus_source_stats_sums",
      (s, dir) => TextAnalysis.corpusSourceStatsSums(Tables.documents(s, dir)),
      Some(sourceStatsSumsSql)),
    // STREAMING per-source dashboard twin: the five exact sums ride
    // GroupState across micro-batches (per-doc metrics are exact longs, so
    // any batch split yields the same state); final render = the same
    // integer half-up means — hash-matches the batch oracle above
    GraftQuery(
      "corpus_source_stats_stream",
      (s, dir) => {
        import org.apache.spark.sql.streaming.Trigger
        val docs = Tables.documents(s, dir)
        val median = docs.selectExpr("percentile(doc_id, 0.5)").head().getDouble(0).toLong
        val src = StreamStage.stagedSource(s, Seq(
          docs.filter(col("doc_id") <= median),
          docs.filter(col("doc_id") > median)), "graft-srcstats-stream")
        val sink = s"corpus_source_stats_stream_${System.nanoTime()}"
        StreamStage.withStatePartitions(s) {
          val q = graft.streaming.StreamingCorpusStats
            .sourceStatsUpdates(src)
            .writeStream
            .format("memory")
            .queryName(sink)
            .outputMode("update")
            .trigger(Trigger.AvailableNow())
            .start()
          q.awaitTermination()
        }
        graft.streaming.StreamingCorpusStats.renderFinal(s.table(sink))
      },
      Some(sourceStatsSql)),
    // document fingerprint (rolling polynomial hash over ordered tokens)
    GraftQuery(
      "doc_fingerprint",
      (s, dir) =>
        Tables
          .documents(s, dir)
          .select(col("doc_id"), TextAnalysis.fingerprint(TextAnalysis.tokens(col("text"))).as("fp")),
      Some(s"""SELECT doc_id,
list_reduce(list_prepend(CAST(0 AS BIGINT),
  list_transform(string_split(text, ' '), tok -> ${sqlTokenHash("tok")})),
  (h, th) -> (h * ${TextAnalysis.TokenB} + th) % ${TextAnalysis.HashP}) AS fp
FROM documents""")),
    // token-budget corpus selection: per source, best-quality docs first
    // until the char budget is spent. The oracle states the per-source
    // window-cumsum rule; the Spark plan replaces the per-source global
    // sort with a (source, 4dp-quality) bucket walk + broadcast threshold
    // — only the boundary bucket pays a sort (operator Scaladoc)
    GraftQuery(
      "corpus_budget_select",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val scored = docs
          .join(TextAnalysis.qualityScore(docs), "doc_id")
          .select(col("doc_id"), col("source"), col("n_chars"), col("quality"))
        Sampling.budgetSelect(scored, budget = 3000L)
      },
      Some(s"""WITH ql AS (
  SELECT doc_id, source, n_chars, $qualitySql AS quality
  FROM (SELECT doc_id, source, n_chars, string_split(text, ' ') AS t FROM documents)
),
c AS (
  SELECT doc_id, source, quality, n_chars,
         sum(n_chars) OVER (PARTITION BY source ORDER BY quality DESC, doc_id ASC
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM ql
)
SELECT doc_id, source, quality, n_chars FROM c WHERE cum <= 3000""")),
    // overlapping sliding-window chunking (the RAG/context-window shape):
    // window 32, stride 24 — consecutive chunks share 8 tokens; each chunk
    // emits its token span + rolling fingerprint, never the text. Map-side
    // explode of ⌈n/stride⌉ rows per doc
    GraftQuery(
      "chunk_overlap",
      (s, dir) => Packing.chunkOverlap(Tables.documents(s, dir), window = 32, stride = 24),
      Some(s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
s AS (SELECT doc_id, t, unnest(range(0, len(t), 24)) AS st FROM d)
SELECT doc_id,
  CAST(st // 24 AS INT) AS chunk_idx,
  CAST(st AS INT) AS start_tok,
  CAST(least(32, len(t) - st) AS INT) AS n_tokens,
  list_reduce(list_prepend(CAST(0 AS BIGINT),
    list_transform(t[CAST(st + 1 AS INT):CAST(st + least(32, len(t) - st) AS INT)],
      tok -> ${sqlTokenHash("tok")})),
    (h, th) -> (h * ${TextAnalysis.TokenB} + th) % ${TextAnalysis.HashP}) AS chunk_fp
FROM s""")),
    // tokenizer FERTILITY per source: subword pieces per whitespace word
    // (×10⁴) — the corpus-health metric that prices training cost and
    // flags sources the subword vocabulary serves badly. Map-side per-doc
    // counts, one partial-aggregated groupBy — a pure scan at 100 TB
    GraftQuery(
      "source_token_fertility",
      (s, dir) => TextAnalysis.tokenFertility(Tables.documents(s, dir)),
      Some("""WITH d AS (
  SELECT source, CAST(len(string_split(text, ' ')) AS BIGINT) AS w,
    regexp_extract_all(text, '[a-z0-9]{1,4}|[^a-z0-9 ]') AS st
  FROM documents
),
p AS (
  SELECT source, w, CAST(len(st) AS BIGINT) AS s,
    CAST(list_sum(list_transform(st, x -> CAST(len(x) AS BIGINT))) AS BIGINT) AS sl
  FROM d
)
SELECT source, CAST(sum(w) AS BIGINT) AS n_words, CAST(sum(s) AS BIGINT) AS n_subtok,
  CAST(CAST(sum(s) AS BIGINT) * 10000 // CAST(sum(w) AS BIGINT) AS BIGINT) AS fertility_bp,
  CAST(CAST(sum(sl) AS BIGINT) * 10000 // CAST(sum(s) AS BIGINT) AS BIGINT) AS chars_per_subtok_bp
FROM p GROUP BY source""")),
    // BPE-ish subword counting: greedy ≤4-char alphanumeric pieces +
    // punctuation singletons — the byte-pair-shaped token budget estimate;
    // greedy regex is deterministic on both engines, ratios in integer bp
    GraftQuery(
      "doc_token_bpe",
      (s, dir) => TextAnalysis.subwordStats(Tables.documents(s, dir)),
      Some("""WITH st AS (
  SELECT doc_id, regexp_extract_all(text, '[a-z0-9]{1,4}|[^a-z0-9 ]') AS t FROM documents
)
SELECT doc_id,
  CAST(len(t) AS INT) AS n_subtok,
  CAST(len(list_distinct(t)) AS INT) AS n_subtok_uniq,
  CAST(CAST(list_sum(list_transform(t, x -> CAST(len(x) AS BIGINT))) AS BIGINT) * 10000 // len(t) AS BIGINT)
    AS chars_per_subtok_bp
FROM st""")),
    // streaming twin of chunk_overlap: the chunker is a stateless map-side
    // transform, so it runs unchanged over micro-batches (append mode) and
    // the union of batch outputs hash-matches the batch oracle — each doc
    // lands in exactly one micro-batch, chunks depend only on that doc
    GraftQuery(
      "chunk_overlap_stream",
      (s, dir) => {
        import org.apache.spark.sql.streaming.Trigger
        val docs = Tables.documents(s, dir)
        val median = docs.selectExpr("percentile(doc_id, 0.5)").head().getDouble(0).toLong
        val stage = StreamStage.dir("graft-chunk-stream")
        val d1 = stage.resolve("b0"); val d2 = stage.resolve("b1")
        docs.filter(col("doc_id") <= median)
          .coalesce(1).write.mode("overwrite").parquet(d1.toString)
        docs.filter(col("doc_id") > median)
          .coalesce(1).write.mode("overwrite").parquet(d2.toString)
        import java.nio.file.attribute.FileTime
        def touch(p: java.nio.file.Path, t: Long): Unit =
          java.nio.file.Files.walk(p).forEach(f =>
            java.nio.file.Files.setLastModifiedTime(f, FileTime.fromMillis(t)))
        val now = System.currentTimeMillis()
        touch(d1, now - 120000); touch(d2, now - 60000)
        val src = s.readStream
          .schema(s.read.parquet(d1.toString).schema)
          .option("maxFilesPerTrigger", 1)
          .parquet(s"$stage/b*")
        val sink = s"chunk_overlap_stream_${System.nanoTime()}"
        StreamStage.withStatePartitions(s) {
          val q = Packing
            .chunkOverlap(src, window = 32, stride = 24)
            .writeStream
            .format("memory")
            .queryName(sink)
            .outputMode("append")
            .trigger(Trigger.AvailableNow())
            .start()
          q.awaitTermination()
        }
        s.table(sink)
      },
      Some(s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
s AS (SELECT doc_id, t, unnest(range(0, len(t), 24)) AS st FROM d)
SELECT doc_id,
  CAST(st // 24 AS INT) AS chunk_idx,
  CAST(st AS INT) AS start_tok,
  CAST(least(32, len(t) - st) AS INT) AS n_tokens,
  list_reduce(list_prepend(CAST(0 AS BIGINT),
    list_transform(t[CAST(st + 1 AS INT):CAST(st + least(32, len(t) - st) AS INT)],
      tok -> ${sqlTokenHash("tok")})),
    (h, th) -> (h * ${TextAnalysis.TokenB} + th) % ${TextAnalysis.HashP}) AS chunk_fp
FROM s""")),
    // pairwise source-vocabulary overlap (cross-source diversity matrix):
    // Jaccard of distinct-term sets per source pair, exact integer basis
    // points — per-doc array_distinct prunes before the (source, term)
    // shuffle, the self-join keys on term, per-source sizes broadcast
    GraftQuery(
      "source_vocab_overlap",
      (s, dir) => TextAnalysis.sourceVocabOverlap(Tables.documents(s, dir)),
      Some("""WITH v AS (
  SELECT DISTINCT source, term
  FROM (SELECT source, unnest(list_distinct(string_split(text, ' '))) AS term FROM documents)
),
sz AS (SELECT source, count(*) AS vsize FROM v GROUP BY 1),
i AS (
  SELECT a.source AS src_a, b.source AS src_b, count(*) AS inter_sz
  FROM v a JOIN v b ON a.term = b.term AND a.source < b.source
  GROUP BY 1, 2
)
SELECT i.src_a, i.src_b, i.inter_sz,
  sa.vsize + sb.vsize - i.inter_sz AS union_sz,
  CAST(i.inter_sz * 10000 // (sa.vsize + sb.vsize - i.inter_sz) AS BIGINT) AS jaccard_bp
FROM i JOIN sz sa ON sa.source = i.src_a JOIN sz sb ON sb.source = i.src_b""")),
    // per-source token-distribution drift (domain-shift monitor): exact
    // total-variation distance between the source's unigram mix and the
    // corpus mix, integer rationals end to end — c_t rolls up from the
    // same (source, term) counts, never a second corpus scan
    GraftQuery(
      "source_vocab_drift",
      (s, dir) => TextAnalysis.sourceVocabDrift(Tables.documents(s, dir)),
      Some("""WITH st AS (
  SELECT source, term, count(*) AS c_st
  FROM (SELECT source, unnest(string_split(text, ' ')) AS term FROM documents)
  GROUP BY 1, 2
),
ct AS (SELECT term, sum(c_st) AS c_t FROM st GROUP BY 1),
ns AS (SELECT source, sum(c_st) AS n_s FROM st GROUP BY 1),
tot AS (SELECT sum(n_s) AS n FROM ns),
agg AS (
  SELECT st.source AS source, count(*) AS n_terms, max(ns.n_s) AS n_s,
    sum(abs(st.c_st * tot.n - ct.c_t * ns.n_s)) AS inn,
    sum(ct.c_t) AS cov, max(tot.n) AS n
  FROM st JOIN ct ON ct.term = st.term
  JOIN ns ON ns.source = st.source CROSS JOIN tot
  GROUP BY 1
)
SELECT source, n_terms,
  CAST((inn + (n - cov) * n_s) * 10000 // (2 * n_s * n) AS BIGINT) AS tv_bp
FROM agg""")),
    // unigram-LM rarity (the CCNet/KenLM perplexity-filter surrogate):
    // tf-weighted mean inverse corpus frequency per doc, exact 64-bit
    // integer arithmetic — ln differs in the last ulp across libms, the
    // rational surrogate cannot. Text never moves past the tokenizer
    GraftQuery(
      "doc_rarity",
      (s, dir) => TextAnalysis.rarityScore(Tables.documents(s, dir)),
      Some("""WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
v AS (SELECT term, sum(tf) AS cnt FROM tf GROUP BY 1),
tot AS (SELECT sum(cnt) AS total FROM v)
SELECT tf.doc_id AS doc_id, CAST(sum(tf.tf) AS INT) AS n_tokens,
  CAST(sum(tf.tf * (tot.total * 10000 // v.cnt)) // sum(tf.tf) AS BIGINT) AS mean_rarity
FROM tf JOIN v ON v.term = tf.term CROSS JOIN tot
GROUP BY 1""")),
    // head/mid/tail vocabulary-coverage buckets: where each document's
    // tokens sit in the corpus frequency spectrum, integer basis points;
    // head+mid list is a bounded TakeOrdered + broadcast, one doc roll-up
    GraftQuery(
      "doc_vocab_buckets",
      (s, dir) => TextAnalysis.vocabCoverage(Tables.documents(s, dir), head = 10, mid = 20),
      Some("""WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
v AS (SELECT term, sum(tf) AS cnt FROM tf GROUP BY 1),
top AS (
  SELECT term, rnk FROM (
    SELECT term, CAST(row_number() OVER (ORDER BY cnt DESC, term ASC) AS INT) AS rnk FROM v
  ) WHERE rnk <= 30
),
b AS (
  SELECT tf.doc_id AS doc_id, tf.tf AS tf,
    CASE WHEN t.rnk <= 10 THEN tf.tf ELSE 0 END AS h,
    CASE WHEN t.rnk > 10 AND t.rnk <= 30 THEN tf.tf ELSE 0 END AS m
  FROM tf LEFT JOIN top t ON t.term = tf.term
)
SELECT doc_id, CAST(sum(tf) AS INT) AS n_tokens,
  CAST(sum(h) * 10000 // sum(tf) AS BIGINT) AS head_bp,
  CAST(sum(m) * 10000 // sum(tf) AS BIGINT) AS mid_bp,
  CAST((sum(tf) - sum(h) - sum(m)) * 10000 // sum(tf) AS BIGINT) AS tail_bp
FROM b GROUP BY 1""")),
    // vocabulary frequency spectrum (Zipf-curve view; hapax share = the
    // cnt=1 row): per occurrence count, type count + shares of types and
    // token mass in integer bp — rows bounded by |distinct tf values|
    GraftQuery(
      "vocab_freq_spectrum",
      (s, dir) => TextAnalysis.freqSpectrum(Tables.documents(s, dir)),
      Some("""WITH toks AS (SELECT unnest(string_split(text, ' ')) AS term FROM documents),
v AS (SELECT term, count(*) AS cnt FROM toks GROUP BY 1),
bk AS (SELECT cnt, count(*) AS n_types FROM v GROUP BY 1),
tot AS (SELECT sum(n_types) AS total_types, sum(cnt * n_types) AS total_mass FROM bk)
SELECT cnt, n_types,
  CAST(n_types * 10000 // tot.total_types AS BIGINT) AS types_bp,
  CAST(cnt * n_types * 10000 // tot.total_mass AS BIGINT) AS mass_bp
FROM bk CROSS JOIN tot""")),
    // PMI bigram collocations (phrase mining / tokenizer-merge signal):
    // top-20 adjacent pairs by the exact rational PMI surrogate
    // c_ab·N·10⁴ DIV (c_a·c_b) — log is monotone in the ratio, so the
    // ranking is PMI's; the score never touches float. Bounded
    // TakeOrdered + precedence rank, no global window
    GraftQuery(
      "vocab_pmi_bigrams",
      (s, dir) => TextAnalysis.pmiBigrams(Tables.documents(s, dir), minCount = 5, k = 20),
      Some("""WITH toks AS (
  SELECT string_split(text, ' ') AS t FROM documents WHERE len(string_split(text, ' ')) >= 2
),
bg0 AS (
  SELECT unnest(list_transform(range(1, len(t)), i ->
    array_to_string(t[CAST(i AS INT):CAST(i + 1 AS INT)], ' '))) AS bg
  FROM toks
),
bi AS (SELECT bg, count(*) AS c_ab FROM bg0 GROUP BY 1 HAVING count(*) >= 5),
uni AS (
  SELECT term, count(*) AS cnt
  FROM (SELECT unnest(string_split(text, ' ')) AS term FROM documents)
  GROUP BY 1
),
tot AS (SELECT sum(cnt) AS n_uni FROM uni),
sc AS (
  SELECT bi.bg AS bg, bi.c_ab AS c_ab, ua.cnt AS c_a, ub.cnt AS c_b,
    CAST(bi.c_ab * tot.n_uni * 10000 // (ua.cnt * ub.cnt) AS BIGINT) AS pmi_score
  FROM bi
  JOIN uni ua ON ua.term = string_split(bi.bg, ' ')[1]
  JOIN uni ub ON ub.term = string_split(bi.bg, ' ')[2]
  CROSS JOIN tot
)
SELECT bg, c_ab, c_a, c_b, pmi_score, rnk FROM (
  SELECT bg, c_ab, c_a, c_b, pmi_score,
    CAST(row_number() OVER (ORDER BY pmi_score DESC, bg ASC) AS INT) AS rnk
  FROM sc
) WHERE rnk <= 20""")),
    // nucleus vocabulary size (tokenizer-design stat: types covering P% of
    // token mass): the walk collapses terms into per-count buckets first,
    // so the running sum never touches the vocabulary row-by-row; the
    // boundary bucket resolves in pure integer arithmetic
    GraftQuery(
      "vocab_nucleus",
      (s, dir) => TextAnalysis.nucleusVocab(Tables.documents(s, dir)),
      Some("""WITH toks AS (SELECT unnest(string_split(text, ' ')) AS term FROM documents),
v AS (SELECT term, count(*) AS cnt FROM toks GROUP BY 1),
bk AS (SELECT cnt, count(*) AS n_terms, cnt * count(*) AS mass FROM v GROUP BY 1),
c AS (
  SELECT cnt, n_terms, mass,
    sum(mass) OVER (ORDER BY cnt DESC) AS cum_mass,
    sum(n_terms) OVER (ORDER BY cnt DESC) AS cum_terms
  FROM bk
),
tot AS (SELECT max(cum_mass) AS total FROM c),
tv AS (SELECT unnest([5000, 9000, 9900]) AS p_bp),
sel AS (
  SELECT tv.p_bp AS p_bp, c.cnt, c.n_terms, c.mass, c.cum_mass, c.cum_terms,
    (tv.p_bp * tot.total + 9999) // 10000 AS need, tot.total AS total
  FROM c CROSS JOIN tot CROSS JOIN tv
  WHERE c.cum_mass >= (tv.p_bp * tot.total + 9999) // 10000
    AND c.cum_mass - c.mass < (tv.p_bp * tot.total + 9999) // 10000
)
SELECT CAST(p_bp AS INT) AS p_bp,
  CAST(cum_terms - n_terms + (need - (cum_mass - mass) + cnt - 1) // cnt AS BIGINT) AS n_terms,
  CAST((cum_mass - mass + ((need - (cum_mass - mass) + cnt - 1) // cnt) * cnt) * 10000 // total AS BIGINT)
    AS covered_bp
FROM sel"""))
  )
}
