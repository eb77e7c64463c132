package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, TextAnalysis}
import graft.sources.Tables

/** Deduplication operators over `documents` (training-data pipeline):
  * exact (content-hash), with MinHash-LSH / SimHash / n-gram-Jaccard /
  * embedding-cosine variants in graft.operators.Dedup.
  */
object DedupQueries {

  private val P = TextAnalysis.HashP

  /** DuckDB: char-fold polynomial hash of expression `tok`. */
  private def sqlTokenHash(tok: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"list_transform(range(1, len($tok)+1), i -> CAST(ascii(substr($tok, CAST(i AS INT), 1)) AS BIGINT))), " +
      s"(h, c) -> (h * 31 + c) % $P)"

  /** DuckDB CTE `sh(doc_id, sh)`: distinct token-3-gram shingle hashes. */
  private val shCte =
    s"""toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
sh AS (
  SELECT doc_id, list_distinct(list_transform(
    CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
         ELSE list_transform(range(1, len(t) - 1), i -> array_to_string(t[i:i+2], ' ')) END,
    s -> ${sqlTokenHash("s")})) AS sh
  FROM toks
)"""

  /** MinHash-LSH pair CTE body (no leading WITH — composable under
    * WITH RECURSIVE) and the full SQL (reused by dedup_minhash_keep). */
  private[queries] def minhashPairsSqlBody: String =
    s"""$shCte,
sig AS (
  SELECT doc_id, sh, list_transform(range(0, 16), i ->
    list_min(list_transform(sh, x -> ((2*i + 3) * x + (97 + 31*i)) % $P))) AS sig
  FROM sh
),
bands AS (
  SELECT doc_id, sh, b.range AS band,
    list_reduce(list_prepend(CAST(0 AS BIGINT),
      sig[CAST(b.range*4 + 1 AS INT):CAST(b.range*4 + 4 AS INT)]),
      (h, x) -> (h * 31 + x) % $P) AS bh
  FROM sig CROSS JOIN range(0, 4) b
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, c.doc_id AS doc_b
  FROM bands a JOIN bands c ON a.band = c.band AND a.bh = c.bh AND a.doc_id < c.doc_id
),
j AS (
  SELECT c.doc_a, c.doc_b,
    round(CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE) /
          (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh))), 4) AS jaccard
  FROM cand c
  JOIN sh sa ON sa.doc_id = c.doc_a
  JOIN sh sb ON sb.doc_id = c.doc_b
)"""

  private[queries] def minhashPairsSql: String = s"WITH $minhashPairsSqlBody"

  def all: Seq[GraftQuery] = Seq(
    // exact dedup: md5 content grouping, keep = lowest doc_id per group.
    // At scale this is one shuffle on the 16-byte digest, never on the text.
    GraftQuery(
      "dedup_exact",
      (s, dir) => {
        val w = Window.partitionBy(md5(col("text").cast("binary")))
        Tables
          .documents(s, dir)
          .select(
            col("doc_id"),
            when(col("doc_id") === min(col("doc_id")).over(w), 1).otherwise(0).as("keep"),
            count(lit(1)).over(w).cast("int").as("n_copies"))
      },
      Some("""SELECT doc_id,
CASE WHEN doc_id = min(doc_id) OVER (PARTITION BY md5(text)) THEN 1 ELSE 0 END AS keep,
CAST(count(*) OVER (PARTITION BY md5(text)) AS INT) AS n_copies
FROM documents""")),
    // normalization-canonical exact dedup (tolower.h case-fold widened to
    // the C4/CCNet canon): lowercase + strip non-[a-z0-9 ] + collapse
    // spaces BEFORE the md5 grouping — catches re-encoded copies that
    // byte-exact dedup misses. Still one shuffle on the digest
    GraftQuery(
      "dedup_normalized",
      (s, dir) => {
        val w = Window.partitionBy(md5(TextAnalysis.normalize(col("text")).cast("binary")))
        Tables
          .documents(s, dir)
          .select(
            col("doc_id"),
            when(col("doc_id") === min(col("doc_id")).over(w), 1).otherwise(0).as("keep"),
            count(lit(1)).over(w).cast("int").as("n_copies"))
      },
      Some("""WITH n AS (
  SELECT doc_id,
    trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')) AS nt
  FROM documents
)
SELECT doc_id,
CASE WHEN doc_id = min(doc_id) OVER (PARTITION BY nt) THEN 1 ELSE 0 END AS keep,
CAST(count(*) OVER (PARTITION BY nt) AS INT) AS n_copies
FROM n""")),
    // per-doc shingle novelty: share of shingles the doc introduces to the
    // corpus (min-doc_id ownership) — the diminishing-novelty curve of
    // crawl-ordered data; one shingle-keyed shuffle + one doc roll-up
    GraftQuery(
      "doc_novelty",
      (s, dir) => Dedup.shingleNovelty(Tables.documents(s, dir)),
      Some(s"""WITH $shCte,
r AS (SELECT doc_id, unnest(sh) AS h FROM sh),
fo AS (SELECT h, min(doc_id) AS fd FROM r GROUP BY 1)
SELECT r.doc_id, count(*) AS n_shingles,
  CAST(sum(CASE WHEN fo.fd = r.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
  CAST(sum(CASE WHEN fo.fd = r.doc_id THEN 1 ELSE 0 END) * 10000 // count(*) AS BIGINT) AS novelty_bp
FROM r JOIN fo ON fo.h = r.h
GROUP BY 1""")),
    // winnowing-fingerprint candidate pairs: local-overlap blocking (any
    // shared ≥6-token run ⇒ shared fingerprint) that whole-doc MinHash
    // bands dilute; one fp-keyed shuffle, corpus-common fingerprints
    // df-capped before the self-join
    GraftQuery(
      "dedup_winnowing_pairs",
      (s, dir) => Dedup.winnowingPairs(Tables.documents(s, dir)),
      Some(s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
hs AS (
  SELECT doc_id, list_transform(
    CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
         ELSE list_transform(range(1, len(t) - 1), i -> array_to_string(t[i:i+2], ' ')) END,
    s -> ${sqlTokenHash("s")}) AS h
  FROM toks
),
fp AS (
  SELECT doc_id, unnest(list_distinct(list_transform(range(1, greatest(len(h) - 3, 1) + 1),
    j -> list_min(h[j:j+3])))) AS fp
  FROM hs
),
rare AS (SELECT fp FROM (SELECT fp, count(*) AS df FROM fp GROUP BY 1) WHERE df <= 50)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared_fps
FROM fp a JOIN rare r ON r.fp = a.fp JOIN fp b ON b.fp = a.fp AND a.doc_id < b.doc_id
GROUP BY 1, 2
HAVING count(*) >= 2""")),
    // MinHash estimator CALIBRATION: per LSH candidate pair, the
    // signature-agreement estimate vs the exact shingle Jaccard (integer
    // bp) + absolute error — the eval run before trusting banded
    // signatures corpus-wide. Same band blocking, all integer arithmetic
    GraftQuery(
      "eval_minhash_est",
      (s, dir) => Dedup.minhashAccuracy(Tables.documents(s, dir)),
      Some(s"""WITH $minhashPairsSqlBody,
acc AS (
  SELECT c.doc_a, c.doc_b,
    CAST(list_sum(list_transform(range(0, 16), i -> CASE WHEN
        list_min(list_transform(sa.sh, x -> ((2*i + 3) * x + (97 + 31*i)) % $P)) =
        list_min(list_transform(sb.sh, x -> ((2*i + 3) * x + (97 + 31*i)) % $P))
      THEN 1 ELSE 0 END)) * 10000 // 16 AS BIGINT) AS est_bp,
    CAST(len(list_intersect(sa.sh, sb.sh)) * 10000 //
      (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh))) AS BIGINT) AS jac_bp
  FROM cand c
  JOIN sh sa ON sa.doc_id = c.doc_a
  JOIN sh sb ON sb.doc_id = c.doc_b
)
SELECT doc_a, doc_b, est_bp, jac_bp, abs(est_bp - jac_bp) AS err_bp FROM acc""")),
    // MinHash (16 perms) + LSH (4 bands × 4) candidate pairs, exact-Jaccard
    // verified at ≥ 0.5 — the standard near-dup pipeline at corpus scale
    GraftQuery(
      "dedup_minhash_lsh",
      (s, dir) => Dedup.minhashLshPairs(Tables.documents(s, dir), threshold = 0.5),
      Some(s"""$minhashPairsSql
SELECT doc_a, doc_b, jaccard FROM j WHERE jaccard >= 0.5""")),
    // cross-source contamination pairs: confirmed near-dups whose members
    // live in DIFFERENT sources — the provenance dashboard deciding which
    // source to keep a duplicate from (and measuring inter-source leakage).
    // Same LSH plan; the 2-column source map broadcasts onto the bounded
    // pair set
    GraftQuery(
      "dedup_cross_source",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val pairs = Dedup.minhashLshPairs(docs, threshold = 0.5)
        val src = docs.select(col("doc_id"), col("source"))
        pairs
          .join(broadcast(src.select(col("doc_id").as("doc_a"), col("source").as("src_a"))), Seq("doc_a"))
          .join(broadcast(src.select(col("doc_id").as("doc_b"), col("source").as("src_b"))), Seq("doc_b"))
          .filter(col("src_a") =!= col("src_b"))
          .select(col("doc_a"), col("doc_b"), col("src_a"), col("src_b"), col("jaccard"))
      },
      Some(s"""$minhashPairsSql
SELECT j.doc_a, j.doc_b, da.source AS src_a, db.source AS src_b, j.jaccard
FROM j
JOIN documents da ON da.doc_id = j.doc_a
JOIN documents db ON db.doc_id = j.doc_b
WHERE j.jaccard >= 0.5 AND da.source <> db.source""")),
    // dedup materialization: documents surviving greedy near-dup removal
    // (drop every doc that appears as the higher id of a confirmed pair)
    GraftQuery(
      "dedup_minhash_keep",
      (s, dir) => {
        val pairs = Dedup.minhashLshPairs(Tables.documents(s, dir), threshold = 0.5)
        Tables
          .documents(s, dir)
          .join(
            pairs.select(col("doc_b").as("doc_id")).distinct(),
            Seq("doc_id"),
            "left_anti")
          .select(col("doc_id"))
      },
      Some(s"""$minhashPairsSql
SELECT doc_id FROM documents
WHERE doc_id NOT IN (SELECT doc_b FROM j WHERE jaccard >= 0.5)""")),
    // connected-components grouping of near-dup pairs: transitive closure
    // to a fixpoint (driver-coordinated min-label propagation), canonical
    // group id = min member — gated against DuckDB's RECURSIVE closure
    GraftQuery(
      "dedup_groups",
      (s, dir) => Dedup.connectedComponents(
        Dedup.minhashLshPairs(Tables.documents(s, dir), threshold = 0.5)),
      Some(s"""WITH RECURSIVE $minhashPairsSqlBody,
edges AS (
  SELECT doc_a AS u, doc_b AS v FROM j WHERE jaccard >= 0.5
  UNION ALL SELECT doc_b, doc_a FROM j WHERE jaccard >= 0.5
),
reach(u, v) AS (
  SELECT u, u FROM (SELECT DISTINCT u FROM edges)
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
)
SELECT u AS doc_id, min(v) AS group_id FROM reach GROUP BY 1""")),
    // quality-based survivor per dup group (the C4/RefinedWeb keep-best
    // convention): survivor = max n_chars, ties to the smaller id; one
    // max_by per group + broadcast join back — no per-group window
    GraftQuery(
      "dedup_groups_keep_best",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val groups = Dedup.connectedComponents(
          Dedup.minhashLshPairs(docs, threshold = 0.5))
        Dedup.keepBestInGroup(groups, docs.select(col("doc_id"), col("n_chars").as("q")))
      },
      Some(s"""WITH RECURSIVE $minhashPairsSqlBody,
edges AS (
  SELECT doc_a AS u, doc_b AS v FROM j WHERE jaccard >= 0.5
  UNION ALL SELECT doc_b, doc_a FROM j WHERE jaccard >= 0.5
),
reach(u, v) AS (
  SELECT u, u FROM (SELECT DISTINCT u FROM edges)
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
),
g AS (SELECT u AS doc_id, min(v) AS group_id FROM reach GROUP BY 1),
sc AS (
  SELECT g.doc_id AS doc_id, g.group_id AS group_id, d.n_chars AS q
  FROM g JOIN documents d ON d.doc_id = g.doc_id
),
best AS (
  SELECT group_id, doc_id AS survivor FROM (
    SELECT group_id, doc_id,
      row_number() OVER (PARTITION BY group_id ORDER BY q DESC, doc_id ASC) AS rn
    FROM sc
  ) WHERE rn = 1
)
SELECT sc.doc_id, sc.group_id, sc.doc_id = best.survivor AS kept
FROM sc JOIN best ON best.group_id = sc.group_id""")),
    // the END-TO-END cleaning decision (the flagship composition a corpus
    // pipeline actually ships): per doc, exact-dup loser? near-dup group
    // loser (LSH → CC → keep-best)? Gopher-gate fail? keep = none of the
    // three. Every stage is the already-gated operator — one digest-keyed
    // window, the banded CC (bounded pairs), a map-side rule scan, then
    // doc_id-keyed joins; text crosses exactly one shuffle (the digest)
    GraftQuery(
      "corpus_clean_keep",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val w = Window.partitionBy(md5(col("text").cast("binary")))
        val exact = docs.select(
          col("doc_id"),
          (col("doc_id") =!= min(col("doc_id")).over(w)).as("exact_dup"))
        val near = Dedup
          .keepBestInGroup(
            Dedup.connectedComponents(Dedup.minhashLshPairs(docs, threshold = 0.5)),
            docs.select(col("doc_id"), col("n_chars").as("q")))
          .select(col("doc_id"), (!col("kept")).as("near_dup"))
        val gop = TextAnalysis
          .gopherRules(docs)
          .select(col("doc_id"), (!col("keep")).as("gopher_fail"))
        exact
          .join(near, Seq("doc_id"), "left")
          .join(gop, "doc_id")
          .select(
            col("doc_id"),
            col("exact_dup"),
            coalesce(col("near_dup"), lit(false)).as("near_dup"),
            col("gopher_fail"),
            (!col("exact_dup") && !coalesce(col("near_dup"), lit(false)) &&
              !col("gopher_fail")).as("keep"))
      },
      Some(s"""WITH RECURSIVE $minhashPairsSqlBody,
edges AS (
  SELECT doc_a AS u, doc_b AS v FROM j WHERE jaccard >= 0.5
  UNION ALL SELECT doc_b, doc_a FROM j WHERE jaccard >= 0.5
),
reach(u, v) AS (
  SELECT u, u FROM (SELECT DISTINCT u FROM edges)
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
),
g AS (SELECT u AS doc_id, min(v) AS group_id FROM reach GROUP BY 1),
sc AS (
  SELECT g.doc_id AS doc_id, g.group_id AS group_id, d.n_chars AS q
  FROM g JOIN documents d ON d.doc_id = g.doc_id
),
best AS (
  SELECT group_id, doc_id AS survivor FROM (
    SELECT group_id, doc_id,
      row_number() OVER (PARTITION BY group_id ORDER BY q DESC, doc_id ASC) AS rn
    FROM sc
  ) WHERE rn = 1
),
nd AS (
  SELECT sc.doc_id AS doc_id, sc.doc_id <> best.survivor AS near_dup
  FROM sc JOIN best ON best.group_id = sc.group_id
),
ex AS (
  SELECT doc_id, doc_id <> min(doc_id) OVER (PARTITION BY md5(text)) AS exact_dup
  FROM documents
),
gp AS (
  SELECT doc_id, NOT (len(t) >= 20 AND len(t) <= 1000
    AND sum_len >= 3 * len(t) AND sum_len <= 10 * len(t)
    AND 5 * alpha_n >= 4 * len(t) AND stop_hits >= 2) AS gopher_fail
  FROM (
    SELECT doc_id, t,
      CAST(list_sum(list_transform(t, x -> CAST(len(x) AS BIGINT))) AS BIGINT) AS sum_len,
      CAST(len(list_filter(t, x -> regexp_matches(x, '[a-zA-Z]'))) AS BIGINT) AS alpha_n,
      len(list_intersect(list_distinct(t), ['the', 'a', 'and', 'of'])) AS stop_hits
    FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
  )
)
SELECT ex.doc_id, ex.exact_dup,
  coalesce(nd.near_dup, false) AS near_dup,
  gp.gopher_fail,
  NOT ex.exact_dup AND NOT coalesce(nd.near_dup, false) AND NOT gp.gopher_fail AS keep
FROM ex LEFT JOIN nd ON nd.doc_id = ex.doc_id JOIN gp ON gp.doc_id = ex.doc_id""")),
    // duplicate-GROUP SIZE histogram: how big do near-dup clusters get —
    // the count that decides whether keep-best suffices or a mirror-heavy
    // source needs dropping; two tiny roll-ups over the CC output
    GraftQuery(
      "dedup_group_sizes",
      (s, dir) => {
        val groups = Dedup.connectedComponents(
          Dedup.minhashLshPairs(Tables.documents(s, dir), threshold = 0.5))
        groups
          .groupBy(col("group_id"))
          .agg(count(lit(1)).as("group_size"))
          .groupBy(col("group_size"))
          .agg(count(lit(1)).as("n_groups"))
      },
      Some(s"""WITH RECURSIVE $minhashPairsSqlBody,
edges AS (
  SELECT doc_a AS u, doc_b AS v FROM j WHERE jaccard >= 0.5
  UNION ALL SELECT doc_b, doc_a FROM j WHERE jaccard >= 0.5
),
reach(u, v) AS (
  SELECT u, u FROM (SELECT DISTINCT u FROM edges)
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
),
g AS (SELECT u AS doc_id, min(v) AS group_id FROM reach GROUP BY 1),
sz AS (SELECT group_id, count(*) AS group_size FROM g GROUP BY 1)
SELECT group_size, count(*) AS n_groups FROM sz GROUP BY 1""")),
    // deterministic global shuffle rank (reproducible training-data
    // permutation): two-phase — order-preserving range buckets + driver
    // prefix sums + per-bucket ranks — same answer as the global-sort
    // row_number, without the single-reducer sort
    GraftQuery(
      "corpus_shuffle_rank",
      (s, dir) => graft.operators.Sampling.shuffleRank(Tables.documents(s, dir)),
      Some(s"""WITH keyed AS (
  SELECT doc_id, ${sqlTokenHash("md5(text)")} AS h FROM documents
)
SELECT doc_id,
  CAST(row_number() OVER (ORDER BY h ASC, doc_id ASC) AS BIGINT) AS shuffle_rank
FROM keyed""")),
    // n-gram Jaccard with 1-permutation (min shingle hash) blocking
    GraftQuery(
      "dedup_ngram_jaccard",
      (s, dir) => Dedup.ngramJaccardPairs(Tables.documents(s, dir), threshold = 0.6),
      Some(s"""WITH $shCte,
blk AS (SELECT doc_id, sh, list_min(sh) AS blk FROM sh),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
    round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
          (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))), 4) AS jaccard
  FROM blk a JOIN blk b ON a.blk = b.blk AND a.doc_id < b.doc_id
)
SELECT DISTINCT doc_a, doc_b, jaccard FROM pairs WHERE jaccard >= 0.6""")),
    // 32-bit SimHash, byte-banded, hamming ≤ 3
    GraftQuery(
      "dedup_simhash",
      (s, dir) => Dedup.simhashPairs(Tables.documents(s, dir), maxHamming = 3),
      Some(s"""WITH $shCte,
sig AS (
  SELECT doc_id, list_reduce(list_prepend(CAST(0 AS BIGINT),
    list_transform(range(0, 32), b ->
      CASE WHEN list_sum(list_transform(sh, x ->
        (CASE WHEN CAST(floor(x / (2.0 ** b)) AS BIGINT) % 2 = 1 THEN 1 ELSE -1 END))) > 0
      THEN CAST(2.0 ** b AS BIGINT) ELSE 0 END)),
    (h, v) -> h + v) AS sig
  FROM sh
),
bands AS (
  SELECT doc_id, sig, b.range AS b, (sig >> CAST(b.range * 8 AS INT)) & 255 AS bv
  FROM sig CROSS JOIN range(0, 4) b
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, c.doc_id AS doc_b,
    CAST(bit_count(xor(a.sig, c.sig)) AS INT) AS hamming
  FROM bands a JOIN bands c ON a.b = c.b AND a.bv = c.bv AND a.doc_id < c.doc_id
)
SELECT doc_a, doc_b, hamming FROM cand WHERE hamming <= 3""")),
    // end-to-end corpus cleaning: exact dedup → near-dup removal → quality
    // filter, reported as per-stage survivor counts (the composed training
    // -data pipeline over the dedup + text-analysis operators)
    GraftQuery(
      "pipeline_clean_corpus",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val w = Window.partitionBy(md5(col("text").cast("binary")))
        val exactKeep = docs
          .withColumn("_mn", min(col("doc_id")).over(w))
          .filter(col("doc_id") === col("_mn"))
          .select(col("doc_id"), col("text"))
        val pairs = Dedup.minhashLshPairs(docs, threshold = 0.5)
        val nearKeep = exactKeep.join(
          pairs.select(col("doc_b").as("doc_id")).distinct(),
          Seq("doc_id"),
          "left_anti")
        val clean = TextAnalysis
          .qualityScore(nearKeep)
          .filter(col("quality") > 0.5)
        docs
          .agg(count(lit(1)).as("n_in"))
          .crossJoin(exactKeep.agg(count(lit(1)).as("n_exact")))
          .crossJoin(nearKeep.agg(count(lit(1)).as("n_neardup")))
          .crossJoin(clean.agg(count(lit(1)).as("n_clean")))
      },
      Some(s"""$minhashPairsSql,
exact_keep AS (
  SELECT doc_id, text FROM (
    SELECT doc_id, text, min(doc_id) OVER (PARTITION BY md5(text)) AS mn FROM documents
  ) WHERE doc_id = mn
),
near_keep AS (
  SELECT doc_id, text FROM exact_keep
  WHERE doc_id NOT IN (SELECT doc_b FROM j WHERE jaccard >= 0.5)
),
qual AS (
  SELECT doc_id, ${TextQueries.qualitySql} AS quality
  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM near_keep)
)
SELECT (SELECT count(*) FROM documents) AS n_in,
       (SELECT count(*) FROM exact_keep) AS n_exact,
       (SELECT count(*) FROM near_keep) AS n_neardup,
       (SELECT count(*) FROM qual WHERE quality > 0.5) AS n_clean""")),
    // embedding near-dup at the 100-TB shape: random-hyperplane LSH
    // (sign-bit signatures over a fixed projection set, banded byte keys)
    // generates candidates WITHOUT an all-pairs scan; exact cosine
    // verifies collisions only. Deterministic projections (the first 16
    // vectors) make the whole path oracle-expressible.
    GraftQuery(
      "embed_nn_lsh",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val proj = emb
          .filter(col("vec_id") < 16)
          .select(col("vec_id").cast("int").as("pid"), col("embedding").as("pvec"))
        Dedup.cosineLshPairs(emb, proj, threshold = 0.35)
      },
      Some("""WITH p AS (SELECT CAST(vec_id AS INT) AS pid, embedding AS pvec FROM embeddings WHERE vec_id < 16),
bits AS (
  SELECT e.vec_id, p.pid,
    CASE WHEN list_sum(list_transform(range(1, len(e.embedding)+1), i ->
      CAST(e.embedding[i] AS DOUBLE) * CAST(p.pvec[i] AS DOUBLE))) >= 0 THEN 1 ELSE 0 END AS bit
  FROM embeddings e CROSS JOIN p
),
sigs AS (
  SELECT vec_id,
    sum(CASE WHEN pid BETWEEN 0 AND 7 THEN bit << pid ELSE 0 END) AS k0,
    sum(CASE WHEN pid BETWEEN 8 AND 15 THEN bit << (pid - 8) ELSE 0 END) AS k1
  FROM bits GROUP BY 1
),
banded AS (
  SELECT vec_id, 0 AS band, k0 AS key FROM sigs
  UNION ALL SELECT vec_id, 1 AS band, k1 AS key FROM sigs
),
cand AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
  FROM banded a JOIN banded b ON a.band = b.band AND a.key = b.key AND a.vec_id < b.vec_id
),
scored AS (
  SELECT c.id_a, c.id_b,
    round(list_sum(list_transform(range(1, len(a.embedding)+1), i ->
      CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))) /
      (sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) *
       sqrt(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 4) AS cosine
  FROM cand c JOIN embeddings a ON a.vec_id = c.id_a JOIN embeddings b ON b.vec_id = c.id_b
)
SELECT id_a, id_b, cosine FROM scored WHERE cosine >= 0.35""")),
    // MULTI-PROBE embedding LSH (Lv et al., VLDB'07): each band key is
    // probed at Hamming distance ≤ 1 (flip each of the 8 bits) — a
    // near-boundary sign flip no longer costs a missed candidate, so the
    // same recall needs fewer bands/tables (fewer shuffled key rows at
    // 100 TB). Verification unchanged; candidates a strict superset of
    // the single-probe run
    GraftQuery(
      "embed_nn_lsh_multiprobe",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val proj = emb
          .filter(col("vec_id") < 16)
          .select(col("vec_id").cast("int").as("pid"), col("embedding").as("pvec"))
        Dedup.cosineLshPairs(emb, proj, threshold = 0.35, probeBits = 8)
      },
      Some("""WITH p AS (SELECT CAST(vec_id AS INT) AS pid, embedding AS pvec FROM embeddings WHERE vec_id < 16),
bits AS (
  SELECT e.vec_id, p.pid,
    CASE WHEN list_sum(list_transform(range(1, len(e.embedding)+1), i ->
      CAST(e.embedding[i] AS DOUBLE) * CAST(p.pvec[i] AS DOUBLE))) >= 0 THEN 1 ELSE 0 END AS bit
  FROM embeddings e CROSS JOIN p
),
sigs AS (
  SELECT vec_id,
    sum(CASE WHEN pid BETWEEN 0 AND 7 THEN bit << pid ELSE 0 END) AS k0,
    sum(CASE WHEN pid BETWEEN 8 AND 15 THEN bit << (pid - 8) ELSE 0 END) AS k1
  FROM bits GROUP BY 1
),
banded AS (
  SELECT vec_id, 0 AS band, k0 AS key FROM sigs
  UNION ALL SELECT vec_id, 1 AS band, k1 AS key FROM sigs
),
probes AS (
  SELECT vec_id, band,
    xor(CAST(key AS BIGINT), CASE WHEN r.j = 0 THEN 0 ELSE 1 << (r.j - 1) END) AS key
  FROM banded CROSS JOIN range(0, 9) r(j)
),
cand AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
  FROM probes a JOIN banded b ON a.band = b.band AND a.key = b.key AND a.vec_id < b.vec_id
),
scored AS (
  SELECT c.id_a, c.id_b,
    round(list_sum(list_transform(range(1, len(a.embedding)+1), i ->
      CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))) /
      (sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) *
       sqrt(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 4) AS cosine
  FROM cand c JOIN embeddings a ON a.vec_id = c.id_a JOIN embeddings b ON b.vec_id = c.id_b
)
SELECT id_a, id_b, cosine FROM scored WHERE cosine >= 0.35""")),
    // connected-components grouping over the embedding near-dup pairs —
    // the same transitive-closure stage as dedup_groups, on the LSH-
    // verified cosine pairs (the 100-TB embedding-dedup path end to end)
    GraftQuery(
      "embed_dup_groups",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val proj = emb
          .filter(col("vec_id") < 16)
          .select(col("vec_id").cast("int").as("pid"), col("embedding").as("pvec"))
        val pairs = Dedup.cosineLshPairs(emb, proj, threshold = 0.35)
          .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"))
        Dedup.connectedComponents(pairs)
          .select(col("doc_id").as("vec_id"), col("group_id"))
      },
      Some("""WITH RECURSIVE p AS (SELECT CAST(vec_id AS INT) AS pid, embedding AS pvec FROM embeddings WHERE vec_id < 16),
bits AS (
  SELECT e.vec_id, p.pid,
    CASE WHEN list_sum(list_transform(range(1, len(e.embedding)+1), i ->
      CAST(e.embedding[i] AS DOUBLE) * CAST(p.pvec[i] AS DOUBLE))) >= 0 THEN 1 ELSE 0 END AS bit
  FROM embeddings e CROSS JOIN p
),
sigs AS (
  SELECT vec_id,
    sum(CASE WHEN pid BETWEEN 0 AND 7 THEN bit << pid ELSE 0 END) AS k0,
    sum(CASE WHEN pid BETWEEN 8 AND 15 THEN bit << (pid - 8) ELSE 0 END) AS k1
  FROM bits GROUP BY 1
),
banded AS (
  SELECT vec_id, 0 AS band, k0 AS key FROM sigs
  UNION ALL SELECT vec_id, 1 AS band, k1 AS key FROM sigs
),
cand AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
  FROM banded a JOIN banded b ON a.band = b.band AND a.key = b.key AND a.vec_id < b.vec_id
),
scored AS (
  SELECT c.id_a, c.id_b,
    round(list_sum(list_transform(range(1, len(a.embedding)+1), i ->
      CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))) /
      (sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) *
       sqrt(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 4) AS cosine
  FROM cand c JOIN embeddings a ON a.vec_id = c.id_a JOIN embeddings b ON b.vec_id = c.id_b
),
edges AS (
  SELECT id_a AS u, id_b AS v FROM scored WHERE cosine >= 0.35
  UNION ALL SELECT id_b, id_a FROM scored WHERE cosine >= 0.35
),
reach(u, v) AS (
  SELECT u, u FROM (SELECT DISTINCT u FROM edges)
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
)
SELECT u AS vec_id, min(v) AS group_id FROM reach GROUP BY 1""")),
    // streaming exact dedup: per-digest GroupState carries (survivor id,
    // copies) across micro-batches — a duplicate arriving in a later batch
    // is still dropped; survivor = global min id (order-insensitive), so
    // the final state hash-matches the batch min-id-per-digest oracle
    GraftQuery(
      "dedup_exact_stream",
      (s, dir) => {
        import org.apache.spark.sql.streaming.Trigger
        val docs = Tables.documents(s, dir)
        val median = docs.selectExpr("percentile(doc_id, 0.5)").head().getDouble(0).toLong
        val src = StreamStage.stagedSource(s, Seq(
          docs.filter(col("doc_id") <= median),
          docs.filter(col("doc_id") > median)), "graft-dedup-stream")
        val sink = s"dedup_exact_stream_${System.nanoTime()}"
        StreamStage.withStatePartitions(s) {
          val q = graft.streaming.StreamingDedup
            .dedupUpdates(src)
            .writeStream
            .format("memory")
            .queryName(sink)
            .outputMode("update")
            .trigger(Trigger.AvailableNow())
            .start()
          q.awaitTermination()
        }
        // per digest: survivor id only shrinks, copies only grow — the
        // final state is (min doc_id, max n_copies)
        s.table(sink)
          .groupBy(col("digest"))
          .agg(min(col("doc_id")).as("doc_id"), max(col("n_copies")).as("n_copies"))
          .select(col("doc_id"), col("n_copies"))
      },
      Some("""SELECT min(doc_id) AS doc_id, count(*) AS n_copies
FROM documents GROUP BY md5(text)""")),
    // streaming MinHash-LSH near-dup blocking: per-band-key GroupState
    // carries the minimum doc id across micro-batches; a doc is flagged
    // iff an EARLIER doc shares any band key — identical to the batch
    // self-join whatever the batch split, so the streaming result
    // hash-matches the batch oracle
    GraftQuery(
      "dedup_lsh_stream",
      (s, dir) => {
        import org.apache.spark.sql.streaming.Trigger
        val docs = Tables.documents(s, dir)
        val median = docs.selectExpr("percentile(doc_id, 0.5)").head().getDouble(0).toLong
        val src = StreamStage.stagedSource(s, Seq(
          docs.filter(col("doc_id") <= median),
          docs.filter(col("doc_id") > median)), "graft-lsh-stream")
        val sink = s"dedup_lsh_stream_${System.nanoTime()}"
        StreamStage.withStatePartitions(s) {
          val q = graft.streaming.StreamingDedup
            .lshCollisionUpdates(src)
            .writeStream
            .format("memory")
            .queryName(sink)
            .outputMode("update")
            .trigger(Trigger.AvailableNow())
            .start()
          q.awaitTermination()
        }
        // one row per (doc, band) in the sink; a doc is flagged if ANY
        // band collided with history
        s.table(sink)
          .groupBy(col("doc_id"))
          .agg(max(col("hit")).cast("int").as("hit"))
      },
      Some(s"""WITH $minhashPairsSqlBody,
coll AS (
  SELECT DISTINCT b2.doc_id AS doc_id
  FROM bands b1 JOIN bands b2
    ON b1.band = b2.band AND b1.bh = b2.bh AND b1.doc_id < b2.doc_id
)
SELECT d.doc_id, CAST(CASE WHEN c.doc_id IS NULL THEN 0 ELSE 1 END AS INT) AS hit
FROM documents d LEFT JOIN coll c ON c.doc_id = d.doc_id""")),
    // deterministic train/val/test split by CONTENT hash (leakage guard:
    // exact duplicates always land in the same split) — map-side only
    GraftQuery(
      "corpus_split",
      (s, dir) => Dedup.hashSplit(Tables.documents(s, dir)),
      Some("""SELECT doc_id,
CASE WHEN substr(md5(text), 1, 2) < 'cd' THEN 'train'
     WHEN substr(md5(text), 1, 2) < 'e6' THEN 'val'
     ELSE 'test' END AS split
FROM documents""")),
    // embedding-cosine nearest neighbor per vector (near-dup scan shape)
    GraftQuery(
      "embed_nn_cosine",
      (s, dir) => Dedup.cosineTop1(Tables.embeddings(s, dir)),
      Some("""WITH e AS (SELECT vec_id, embedding FROM embeddings),
pairs AS (
  SELECT a.vec_id AS qid, b.vec_id AS nid,
    round(list_sum(list_transform(range(1, len(a.embedding)+1), i ->
      CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))) /
      (sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) *
       sqrt(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 4) AS dist
  FROM e a CROSS JOIN e b WHERE a.vec_id <> b.vec_id
)
SELECT qid, nid, dist FROM (
  SELECT qid, nid, dist, row_number() OVER (PARTITION BY qid ORDER BY dist DESC, nid ASC) AS rn
  FROM pairs
) WHERE rn = 1""")),
    // benchmark DECONTAMINATION: flag corpus docs sharing any token-3-gram
    // shingle with the held-out eval set (doc_id % 97 = 0) — the hygiene
    // pass between a crawl and a training run. Eval shingles broadcast;
    // the corpus never shuffles wider than (doc_id, hash)
    GraftQuery(
      "decontaminate_ngram",
      (s, dir) =>
        Dedup.decontaminate(Tables.documents(s, dir), col("doc_id") % 97 === 0),
      Some(s"""WITH $shCte,
ev AS (SELECT DISTINCT unnest(sh) AS h FROM sh WHERE doc_id % 97 = 0),
tr AS (SELECT doc_id, unnest(sh) AS h FROM sh WHERE doc_id % 97 <> 0)
SELECT tr.doc_id AS doc_id, count(*) AS n_shared
FROM tr JOIN ev ON ev.h = tr.h
GROUP BY tr.doc_id""")),
    // STREAMING decontamination — the deployment shape: the benchmark set
    // is STATIC (broadcast into every micro-batch), the corpus arrives as
    // a stream; per-doc overlap counts are the only state. Hash-matches
    // the batch decontaminate_ngram oracle
    GraftQuery(
      "decontaminate_stream",
      (s, dir) => {
        import org.apache.spark.sql.streaming.Trigger
        val docs = Tables.documents(s, dir)
        val evalDocs = docs.filter(col("doc_id") % 97 === 0)
        val corpus = docs.filter(col("doc_id") % 97 =!= 0)
        val median = corpus.selectExpr("percentile(doc_id, 0.5)").head().getDouble(0).toLong
        val src = StreamStage.stagedSource(s, Seq(
          corpus.filter(col("doc_id") <= median),
          corpus.filter(col("doc_id") > median)), "graft-decon-stream")
        val sink = s"decontaminate_stream_${System.nanoTime()}"
        StreamStage.withStatePartitions(s) {
          val q = Dedup.decontaminateStream(src, evalDocs)
            .writeStream.format("memory").queryName(sink)
            .outputMode("complete").trigger(Trigger.AvailableNow()).start()
          q.awaitTermination()
        }
        s.table(sink)
      },
      Some(s"""WITH $shCte,
ev AS (SELECT DISTINCT unnest(sh) AS h FROM sh WHERE doc_id % 97 = 0),
tr AS (SELECT doc_id, unnest(sh) AS h FROM sh WHERE doc_id % 97 <> 0)
SELECT tr.doc_id AS doc_id, count(*) AS n_shared
FROM tr JOIN ev ON ev.h = tr.h
GROUP BY tr.doc_id""")),
    // contamination SEVERITY: the overlap count graded by each doc's own
    // shingle count (integer bp) — the threshold a drop/mask policy reads
    GraftQuery(
      "decontaminate_severity",
      (s, dir) =>
        Dedup.decontaminateSeverity(Tables.documents(s, dir), col("doc_id") % 97 === 0),
      Some(s"""WITH $shCte,
ev AS (SELECT DISTINCT unnest(sh) AS h FROM sh WHERE doc_id % 97 = 0),
tr AS (SELECT doc_id, unnest(sh) AS h FROM sh WHERE doc_id % 97 <> 0),
hit AS (
  SELECT tr.doc_id AS doc_id, count(*) AS n_shared
  FROM tr JOIN ev ON ev.h = tr.h GROUP BY 1
),
tot AS (SELECT doc_id, CAST(len(sh) AS BIGINT) AS n_sh FROM sh WHERE doc_id % 97 <> 0)
SELECT h.doc_id, h.n_shared, t.n_sh,
  CAST(h.n_shared * 10000 // t.n_sh AS BIGINT) AS contam_bp
FROM hit h JOIN tot t ON t.doc_id = h.doc_id""")),
    // cross-source duplication matrix (who copies from whom): verified
    // near-dup pairs per unordered source pair — the provenance dashboard
    // behind source re-weighting
    GraftQuery(
      "dedup_source_matrix",
      (s, dir) => Dedup.sourceDupMatrix(Tables.documents(s, dir), threshold = 0.5),
      Some(s"""$minhashPairsSql,
pp AS (SELECT doc_a, doc_b FROM j WHERE jaccard >= 0.5)
SELECT least(da.source, db.source) AS src_lo,
       greatest(da.source, db.source) AS src_hi,
       count(*) AS n_pairs
FROM pp
JOIN documents da ON da.doc_id = pp.doc_a
JOIN documents db ON db.doc_id = pp.doc_b
GROUP BY 1, 2""")),
    // the SAME contamination answer through the BLOOM pre-filter path
    // (eval bits built distributed + OR-merged, corpus pruned map-side by
    // the codegen'd probe, exact shuffle confirm-join removes the false
    // positives): output identical ⇒ the hash gate certifies the whole
    // bloom build→probe→confirm pipeline
    GraftQuery(
      "decontaminate_bloom",
      (s, dir) =>
        Dedup.decontaminateBloom(Tables.documents(s, dir), col("doc_id") % 89 === 0),
      Some(s"""WITH $shCte,
ev AS (SELECT DISTINCT unnest(sh) AS h FROM sh WHERE doc_id % 89 = 0),
tr AS (SELECT doc_id, unnest(sh) AS h FROM sh WHERE doc_id % 89 <> 0)
SELECT tr.doc_id AS doc_id, count(*) AS n_shared
FROM tr JOIN ev ON ev.h = tr.h
GROUP BY tr.doc_id""")),
    // cross-document duplicated n-gram spans (substring-level exact dedup):
    // per doc, how many of its distinct token-3-gram spans also occur in
    // at least one other document — finds repeated boilerplate that
    // whole-document near-dup misses
    GraftQuery(
      "dup_ngram_spans",
      (s, dir) => Dedup.dupShingleSpans(Tables.documents(s, dir)),
      Some(s"""WITH $shCte,
rws AS (SELECT doc_id, unnest(sh) AS h FROM sh),
dup AS (SELECT h FROM rws GROUP BY h HAVING count(*) >= 2)
SELECT r.doc_id AS doc_id, count(*) AS n_dup_spans
FROM rws r JOIN dup d ON d.h = r.h
GROUP BY r.doc_id""")),
    // stratified quota sampling: first 10 docs of every source stratum in
    // content-hash order — deterministic, layout-independent, and served
    // by the bounded-heap top-k aggregate (map-side partial top-quota; a
    // popular stratum never becomes one giant sorted partition)
    GraftQuery(
      "corpus_sample_stratified",
      (s, dir) =>
        graft.operators.Sampling.stratifiedQuota(
          Tables.documents(s, dir), "source", quota = 10),
      Some(s"""WITH keyed AS (
  SELECT source, doc_id, ${sqlTokenHash("md5(text)")} AS h FROM documents
)
SELECT source, doc_id, sample_rank FROM (
  SELECT source, doc_id,
    CAST(row_number() OVER (PARTITION BY source ORDER BY h ASC, doc_id ASC) AS INT) AS sample_rank
  FROM keyed
) WHERE sample_rank <= 10""")),
    // domain-mixture sampling: per-source keep rates as exact rationals
    // ((idx%10+1)/10 for src<idx>) — the integer comparison den·key <
    // num·P cannot disagree with the oracle at any boundary; map-side only
    GraftQuery(
      "corpus_sample_weighted",
      (s, dir) =>
        graft.operators.Sampling
          .mixtureSample(
            Tables.documents(s, dir),
            (0 until 20).map(i => s"src$i" -> ((i % 10) + 1, 10)).toMap)
          .select(col("doc_id"), col("source")),
      Some(s"""SELECT doc_id, source FROM (
  SELECT doc_id, source, ${sqlTokenHash("md5(text)")} AS k FROM documents
) WHERE 10 * k < CAST((CAST(substr(source, 4, 10) AS INT) % 10) + 1 AS BIGINT) * $P""")),
    // heavy-hitter frequency estimation via a count-min sketch
    // (graft.plans.CountMinAgg): one fixed 32 KiB counter matrix per
    // partition replaces shuffling the full (token, count) vocabulary;
    // counters vector-add (order-invariant) and the min-over-rows read-off
    // is pure long arithmetic, so the overcount-bounded estimates sit
    // under the exact hash gate next to their exact counts
    GraftQuery(
      "vocab_heavy_hitters",
      (s, dir) => {
        val toks = Tables.documents(s, dir)
          .select(explode(split(col("text"), " ")).as("tok"))
        val counters = toks.agg(graft.plans.CountMinAgg.countMin(col("tok")).as("cms"))
        val top = toks
          .groupBy(col("tok"))
          .agg(count(lit(1)).as("n_exact"))
          .orderBy(col("n_exact").desc, col("tok").asc)
          .limit(10)
        top
          .crossJoin(broadcast(counters))
          .select(col("tok"), col("n_exact"),
            graft.plans.CountMinAgg.estimate(col("cms"), col("tok")).as("n_est"))
      },
      Some {
        val rows = (0 until 4)
          .map(r =>
            s"c$r AS (SELECT ${sqlTokenHash(s"concat('cm$r', tok)")} % 1024 AS b, " +
              "count(*) AS c FROM toks GROUP BY 1)")
          .mkString(",\n")
        val joins = (0 until 4)
          .map(r => s"JOIN c$r x$r ON ${sqlTokenHash(s"concat('cm$r', t.tok)")} % 1024 = x$r.b")
          .mkString("\n")
        s"""WITH toks AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
top AS (
  SELECT tok, count(*) AS n_exact FROM toks GROUP BY tok
  ORDER BY n_exact DESC, tok ASC LIMIT 10
),
$rows
SELECT t.tok, t.n_exact, least(x0.c, x1.c, x2.c, x3.c) AS n_est
FROM top t
$joins"""
      }),
    // sequence packing (concat-and-chunk): documents concatenated in
    // content-hash order within 16 md5 shards, chunked every 2048 tokens.
    // Parallel per-shard cumsums, one shuffle, integer-exact arithmetic —
    // the deterministic 100 TB formulation of training-sequence assembly
    GraftQuery(
      "corpus_pack_sequences",
      (s, dir) =>
        graft.operators.Packing.packSequences(Tables.documents(s, dir), budget = 2048),
      Some("""WITH t AS (
  SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
         md5(CAST(doc_id AS VARCHAR)) AS h
  FROM documents
),
c AS (
  SELECT doc_id, substr(h, 1, 1) AS shard, n_tokens,
         CAST(COALESCE(sum(CAST(n_tokens AS BIGINT)) OVER (
           PARTITION BY substr(h, 1, 1) ORDER BY h ASC, doc_id ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_tok
  FROM t
)
SELECT doc_id, shard, n_tokens,
       CAST(start_tok // 2048 AS BIGINT) AS seq_no,
       CAST(start_tok % 2048 AS BIGINT) AS tok_offset
FROM c""")),
    // roll-up of the packing: per-sequence fill statistics
    GraftQuery(
      "corpus_packed_stats",
      (s, dir) =>
        graft.operators.Packing.packedSequenceStats(
          graft.operators.Packing.packSequences(Tables.documents(s, dir), budget = 2048)),
      Some("""WITH t AS (
  SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
         md5(CAST(doc_id AS VARCHAR)) AS h
  FROM documents
),
c AS (
  SELECT doc_id, substr(h, 1, 1) AS shard, n_tokens,
         CAST(COALESCE(sum(CAST(n_tokens AS BIGINT)) OVER (
           PARTITION BY substr(h, 1, 1) ORDER BY h ASC, doc_id ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_tok
  FROM t
)
SELECT shard, CAST(start_tok // 2048 AS BIGINT) AS seq_no,
       count(*) AS n_docs,
       CAST(sum(CAST(n_tokens AS BIGINT)) AS BIGINT) AS tokens_started
FROM c GROUP BY 1, 2""")),
    // deterministic BALANCED output sharding: size-descending round-robin
    // (LPT-style greedy — any shard's excess bounded by one max document);
    // the rank is two-phase (per-size bucket counts → broadcast offsets →
    // in-bucket rank), never a corpus-wide single-reducer sort
    GraftQuery(
      "corpus_shard_assign",
      (s, dir) => graft.operators.Packing.shardAssign(
        Tables.documents(s, dir).select(col("doc_id"), col("n_chars")), shards = 8),
      Some("""SELECT doc_id, n_chars,
  CAST((row_number() OVER (ORDER BY n_chars DESC, doc_id ASC) - 1) % 8 AS INT) AS shard
FROM documents""")),
    // the per-shard balance roll-up a writer checks before committing the
    // output layout — doc counts and byte volumes per shard (the gated
    // numeric form of the one-max-document balance bound)
    GraftQuery(
      "corpus_shard_stats",
      (s, dir) => graft.operators.Packing
        .shardAssign(Tables.documents(s, dir).select(col("doc_id"), col("n_chars")), shards = 8)
        .groupBy(col("shard"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars")),
      Some("""WITH a AS (
  SELECT doc_id, n_chars,
    CAST((row_number() OVER (ORDER BY n_chars DESC, doc_id ASC) - 1) % 8 AS INT) AS shard
  FROM documents
)
SELECT shard, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM a GROUP BY 1""")),
    // incremental (daily-ingest) dedup: new half of the corpus flagged
    // against the historical half — exact by content digest, near by any
    // shared MinHash-LSH band key. History is touched as keys only; both
    // probes are semi-joins on 16-byte/long keys, text never moves
    GraftQuery(
      "dedup_incremental",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val piv = docs.agg(expr("CAST((max(doc_id) + 1) DIV 2 AS BIGINT)").as("p"))
        val withP = docs.crossJoin(broadcast(piv))
        Dedup.incrementalFlags(
          withP.filter(col("doc_id") < col("p")).drop("p"),
          withP.filter(col("doc_id") >= col("p")).drop("p"))
      },
      Some(s"""WITH piv AS (SELECT (max(doc_id) + 1) // 2 AS p FROM documents),
$shCte,
sig AS (
  SELECT doc_id, list_transform(range(0, 16), i ->
    list_min(list_transform(sh, x -> ((2*i + 3) * x + (97 + 31*i)) % $P))) AS sig
  FROM sh
),
bands AS (
  SELECT doc_id, b.range AS band,
    list_reduce(list_prepend(CAST(0 AS BIGINT),
      sig[CAST(b.range*4 + 1 AS INT):CAST(b.range*4 + 4 AS INT)]),
      (h, x) -> (h * 31 + x) % $P) AS bh
  FROM sig CROSS JOIN range(0, 4) b
),
dg AS (SELECT doc_id, md5(text) AS dg FROM documents),
flags AS (
  SELECT d.doc_id,
    EXISTS(SELECT 1 FROM dg h, piv WHERE h.dg = dn.dg AND h.doc_id < piv.p) AS dup_exact,
    EXISTS(SELECT 1 FROM bands h, bands n, piv
           WHERE n.doc_id = d.doc_id AND h.doc_id < piv.p
             AND h.band = n.band AND h.bh = n.bh) AS dup_near
  FROM documents d JOIN dg dn ON dn.doc_id = d.doc_id CROSS JOIN piv
  WHERE d.doc_id >= piv.p
)
SELECT doc_id, dup_exact, dup_near FROM flags WHERE dup_exact OR dup_near""")),
    // asymmetric containment dedup: |A∩B|/|A| ≥ 0.8 flags A as contained
    // in B — the quote-inclusion/wholesale-copy mode symmetric Jaccard
    // misses. Same band blocking as dedup_minhash_lsh; directed output
    GraftQuery(
      "dedup_containment",
      (s, dir) => Dedup.containmentPairs(Tables.documents(s, dir), threshold = 0.8),
      Some(s"""WITH $shCte,
sig AS (
  SELECT doc_id, list_transform(range(0, 16), i ->
    list_min(list_transform(sh, x -> ((2*i + 3) * x + (97 + 31*i)) % $P))) AS sig
  FROM sh
),
bands AS (
  SELECT doc_id, b.range AS band,
    list_reduce(list_prepend(CAST(0 AS BIGINT),
      sig[CAST(b.range*4 + 1 AS INT):CAST(b.range*4 + 4 AS INT)]),
      (h, x) -> (h * 31 + x) % $P) AS bh
  FROM sig CROSS JOIN range(0, 4) b
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, c.doc_id AS doc_b
  FROM bands a JOIN bands c ON a.band = c.band AND a.bh = c.bh AND a.doc_id < c.doc_id
),
cj AS (
  SELECT c.doc_a, c.doc_b,
    len(list_intersect(sa.sh, sb.sh)) AS inter, len(sa.sh) AS la, len(sb.sh) AS lb
  FROM cand c JOIN sh sa ON sa.doc_id = c.doc_a JOIN sh sb ON sb.doc_id = c.doc_b
)
SELECT doc_a AS doc_contained, doc_b AS doc_container,
  round(CAST(inter AS DOUBLE) / la, 4) AS containment
FROM cj WHERE round(CAST(inter AS DOUBLE) / la, 4) >= 0.8
UNION ALL
SELECT doc_b AS doc_contained, doc_a AS doc_container,
  round(CAST(inter AS DOUBLE) / lb, 4) AS containment
FROM cj WHERE round(CAST(inter AS DOUBLE) / lb, 4) >= 0.8""")),
    // SemDeDup (Abbas et al. 2023): cluster the embedding space, drop any
    // vector with a same-cluster lower-id neighbor at cosine ≥ 0.35 —
    // clustering turns the impossible all-pairs cosine join into
    // per-cluster joins bounded by the centroid count
    GraftQuery(
      "dedup_semantic",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
        val cents = Tables
          .embeddings(s, dir)
          .filter(col("vec_id") % 250 === 0)
          .select(col("vec_id").as("cluster_id"), col("embedding").as("centroid"))
        Dedup.semanticDedup(emb, cents, threshold = 0.35)
      },
      Some("""WITH c AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id % 250 = 0),
asn AS (
  SELECT vec_id, embedding, cid FROM (
    SELECT b.vec_id, b.embedding, c.cid,
      row_number() OVER (PARTITION BY b.vec_id ORDER BY
        round(sqrt(list_sum(list_transform(range(1, len(b.embedding)+1), i ->
          (CAST(b.embedding[i] AS DOUBLE) - CAST(c.cv[i] AS DOUBLE)) *
          (CAST(b.embedding[i] AS DOUBLE) - CAST(c.cv[i] AS DOUBLE))))), 4) ASC, c.cid ASC) AS rn
    FROM embeddings b CROSS JOIN c
  ) WHERE rn = 1
),
rm AS (
  SELECT DISTINCT a.vec_id FROM asn a JOIN asn b ON a.cid = b.cid AND b.vec_id < a.vec_id
  WHERE round(list_sum(list_transform(range(1, len(a.embedding)+1), i ->
      CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))) /
    (sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) *
     sqrt(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 4)
    >= 0.35
)
SELECT a.vec_id AS vec_id, CAST(a.cid AS BIGINT) AS cluster_id,
  (rm.vec_id IS NULL) AS keep
FROM asn a LEFT JOIN rm ON rm.vec_id = a.vec_id"""))
  )
}
