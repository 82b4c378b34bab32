package graft.queries

import org.apache.spark.sql.functions._
import graft.ext.{Model, Text}
import H.t

/** Round-16 wave 2 operators: the iteratively-TRAINED classifier face
  * (hashing-trick logistic regression by full-batch gradient descent,
  * the whole parameter trajectory replayed in unrolled SQL),
  * Kneser–Ney smoothing for the fluency LM family (+ the train/score
  * split where the backoff arm fires), the Aho–Corasick multi-phrase
  * tagger, suffix-array prefix doubling (profile / top spans / the
  * excision action), the FineWeb domain-quality rollup (batch +
  * incremental-stream faces), the degenerate-repetition loop tagger,
  * and the quality-signals-v2 wide row bundling the wave's signals.
  */
object ExtN {

  /** The self-trained Kneser–Ney LM replay, prefixable so it can
    * coexist with the JM [[Ext.bigramLmCtes]] block in one oracle (the
    * r17 bucket-agreement query chains BOTH LMs): all four statistics
    * tables (bigram counts, context totals + fan-out, fan-in, type
    * count) and the per-doc probability sum, mirroring
    * [[Text.bigramKneserNey]]'s IEEE operation tree term-for-term.
    * Ends in `${pfx}knlpq(doc_id, n_bigrams, sum_logprob,
    * mean_logprob)`.
    */
  private[queries] def knLmCtes(pfx: String): String =
    s"""${pfx}ktk AS (SELECT doc_id, string_split(text, ' ') AS w
        FROM documents),
      ${pfx}kbi AS (SELECT doc_id, gram, count(*) AS bf FROM (
          SELECT doc_id, unnest(list_transform(range(1, len(w)),
            i -> w[i] || ' ' || w[i+1])) AS gram FROM ${pfx}ktk)
        GROUP BY 1, 2),
      ${pfx}kbic AS MATERIALIZED (SELECT gram,
          CAST(SUM(bf) AS BIGINT) AS bcnt,
          string_split(gram, ' ')[1] AS w1,
          string_split(gram, ' ')[-1] AS w2
        FROM ${pfx}kbi GROUP BY 1),
      ${pfx}kctx AS MATERIALIZED (SELECT w1,
          CAST(SUM(bcnt) AS DOUBLE) AS ctot,
          CAST(COUNT(*) AS DOUBLE) AS n1_fwd
        FROM ${pfx}kbic GROUP BY 1),
      ${pfx}kcont AS MATERIALIZED (SELECT w2,
          CAST(COUNT(*) AS DOUBLE) AS n1_bwd
        FROM ${pfx}kbic GROUP BY 1),
      ${pfx}knbt AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_bigram_types
        FROM ${pfx}kbic),
      ${pfx}kj AS (SELECT bi.doc_id, bi.bf,
          CAST(CAST(bi.bf AS DOUBLE) *
            CAST(CAST(ln(
              GREATEST(CAST(bcnt AS DOUBLE) - CAST(0.75 AS DOUBLE),
                CAST(0 AS DOUBLE)) / ctot
              + (CAST(0.75 AS DOUBLE) * n1_fwd / ctot)
                * (n1_bwd / n_bigram_types))
            AS DECIMAL(20,12)) AS DOUBLE)
          AS DECIMAL(20,12)) AS contrib
        FROM ${pfx}kbi bi JOIN ${pfx}kbic bic USING (gram)
        JOIN ${pfx}kctx ctx ON ctx.w1 = bic.w1
        JOIN ${pfx}kcont cont ON cont.w2 = bic.w2, ${pfx}knbt),
      ${pfx}knlpq AS (SELECT doc_id,
          CAST(SUM(bf) AS BIGINT) AS n_bigrams,
          CAST(CAST(SUM(contrib) AS DECIMAL(38,12)) AS DOUBLE)
            AS sum_logprob,
          CAST(CAST(SUM(contrib) AS DECIMAL(38,12)) AS DOUBLE)
            / CAST(SUM(bf) AS DOUBLE) AS mean_logprob
        FROM ${pfx}kj GROUP BY doc_id)"""

  /** Kneser–Ney bigram fluency ([[Text.bigramKneserNey]], d = 0.75):
    * per-doc sum/mean log-prob under interpolated KN — backoff to
    * CONTINUATION probability (distinct-context fan-in), not raw
    * unigram frequency. The oracle re-derives all four statistics
    * tables (via the shared [[knLmCtes]] replay) and mirrors the
    * probability's IEEE operation tree
    * term-for-term, so a single drifted count or a reassociated
    * multiply flips the hash.
    */
  val xTextBigramKn = Q(
    "x_text_bigram_kn",
    (s, dir) => Text.bigramKneserNey(t(s, dir, "documents"), "text", "doc_id")
      .select(col("doc_id"), col("n_bigrams"), col("sum_logprob"),
        col("mean_logprob"))
      .orderBy(col("doc_id")),
    Some(s"""WITH ${knLmCtes("")}
      SELECT doc_id, n_bigrams, sum_logprob, mean_logprob
      FROM knlpq ORDER BY doc_id"""))

  /** [[Model.logRegFilter]]'s registered configuration: 64 hash
    * buckets, 30 full-batch steps at 2e-4 — reaches 75.2% train
    * accuracy on the Gopher-pass label at sf0.01 (base rate 52.8%;
    * the label is length-driven, so the learned solution is a
    * near-uniform positive token mass against a negative bias — the
    * signal a bag-of-counts linear model CAN represent). Larger steps
    * oscillate (measured: 3e-4 diverges to 48.8%), more steps keep
    * converging slowly (50 → 79.0%) — 30 balances the adjudicated
    * trajectory length against the two-pass-per-iteration cost.
    */
  private[queries] val lrDims = 64
  private[queries] val lrIters = 30
  private[queries] val lrStep = "0.000200"

  /** The unrolled gradient-descent replay: label + hashed-feature base
    * CTEs, then per iteration t the exact-decimal logits `lz{t}` under
    * the previous weights, the VARCHAR-roundtrip-quantized sigmoids
    * `lp{t}`, the exact-decimal gradient `lg{t}`, and the exact update
    * `lw{t}` — the lloydCentroids unrolling applied to a parameter
    * vector. Ends with `lw{iters}` (the final weights) and `lzf`/`lpf`
    * (logits/sigmoids UNDER the final weights, for the filter face).
    */
  private def logRegCtes(dims: Int, iters: Int, step: String): String =
    s"""inj AS (SELECT doc_id, text AS t FROM documents),
      ${ExtI.gopherCtesSql},
      ${logRegCoreCtes(dims, iters, step)}"""

  /** [[logRegCtes]] without the inj/gopher preamble — for oracles that
    * already carry the `gr` verdict chain (the v3 ⋈ v2 full sidecar
    * composes this beside the v1 signal CTEs, whose gopher block is
    * byte-identical to the preamble dropped here).
    */
  private[queries] def logRegCoreCtes(dims: Int, iters: Int,
      step: String): String = {
    val base = s"""llab AS (SELECT doc_id, pass AS label FROM gr),
      lfeat AS MATERIALIZED (
        SELECT doc_id,
            CAST(CAST(concat('0x', substring(sha256(token), 1, 15))
              AS BIGINT) % $dims AS BIGINT) AS b,
            CAST(COUNT(*) AS BIGINT) AS tf
          FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token
            FROM documents)
          WHERE length(token) > 0 GROUP BY 1, 2
        UNION ALL
        SELECT doc_id, CAST($dims AS BIGINT), CAST(1 AS BIGINT) FROM llab),
      ly AS (SELECT doc_id, CAST(CASE WHEN label THEN 1 ELSE 0 END
          AS DECIMAL(2,0)) AS y FROM llab),
      lw0 AS (SELECT CAST(b AS BIGINT) AS b,
          CAST(0 AS DECIMAL(20,12)) AS w
        FROM range(${dims + 1}) t(b))"""
    val steps = (1 to iters).map { i =>
      s"""lz$i AS MATERIALIZED (SELECT f.doc_id,
          CAST(SUM(CAST(f.tf AS DECIMAL(10,0)) * w.w) AS DECIMAL(38,12))
            AS z
        FROM lfeat f JOIN lw${i - 1} w USING (b) GROUP BY 1),
      lp$i AS MATERIALIZED (SELECT doc_id,
          CAST(CAST(CAST(1.0 AS DOUBLE) / (CAST(1.0 AS DOUBLE)
            + exp(-(CAST(z AS DOUBLE)))) AS VARCHAR) AS DECIMAL(20,6))
            AS p
        FROM lz$i),
      lg$i AS MATERIALIZED (SELECT f.b,
          CAST(SUM((p.p - y.y) * CAST(f.tf AS DECIMAL(10,0)))
            AS DECIMAL(32,6)) AS g
        FROM lfeat f JOIN lp$i p USING (doc_id) JOIN ly y USING (doc_id)
        GROUP BY 1),
      lw$i AS MATERIALIZED (SELECT w.b,
          CAST(w.w - CAST('$step' AS DECIMAL(8,6))
            * COALESCE(g.g, CAST(0 AS DECIMAL(32,6))) AS DECIMAL(20,12))
            AS w
        FROM lw${i - 1} w LEFT JOIN lg$i g USING (b))"""
    }.mkString(",\n      ")
    val fin = s"""lzf AS MATERIALIZED (SELECT f.doc_id, f.y,
          CAST(SUM(CASE WHEN f.b < $dims THEN f.tf ELSE 0 END) AS BIGINT)
            AS n_tokens,
          CAST(SUM(CAST(f.tf AS DECIMAL(10,0)) * w.w) AS DECIMAL(38,12))
            AS z
        FROM (SELECT lfeat.*, ly.y FROM lfeat JOIN ly USING (doc_id)) f
        JOIN lw$iters w USING (b) GROUP BY 1, 2),
      lpf AS (SELECT doc_id, y, n_tokens, z,
          CAST(CAST(CAST(1.0 AS DOUBLE) / (CAST(1.0 AS DOUBLE)
            + exp(-(CAST(z AS DOUBLE)))) AS VARCHAR) AS DECIMAL(20,6))
            AS p
        FROM lzf)"""
    s"$base,\n      $steps,\n      $fin"
  }

  /** Gradient-descent-trained weights ([[Model.logRegModel]], 64
    * hash buckets + bias, 30 full-batch steps): the final weight
    * vector. The oracle unrolls ALL 30 ITERATIONS — logits,
    * quantized sigmoids, gradients, exact-decimal updates — so this
    * adjudicates the TRAINING TRAJECTORY itself: a perturbed count,
    * a reordered update, or a drifted quantization in any iteration
    * flips every later weight and the hash.
    */
  val xQualityLogregTrain = Q(
    "x_quality_logreg_train",
    (s, dir) => {
      val docs = t(s, dir, "documents")
      val labeled = docs.join(
        Text.gopherRules(docs, "text", "doc_id")
          .select(col("doc_id"), col("pass").as("label")), "doc_id")
      Model.logRegModel(labeled, "text", "doc_id", "label",
          dims = lrDims, iters = lrIters, step = lrStep)
        .orderBy(col("bucket"))
    },
    Some(s"""WITH ${logRegCtes(lrDims, lrIters, lrStep)}
      SELECT b AS bucket, CAST(w AS DOUBLE) AS weight
      FROM lw$lrIters ORDER BY bucket"""))

  /** Gradient-trained quality filter ([[Model.logRegFilter]]): every
    * doc's exact-decimal logit under the final weights, quantized
    * sigmoid, z > 0 verdict, label, agreement — scored through the
    * SAME unrolled-training replay as the train face, so train and
    * inference adjudicate as one chain.
    */
  val xQualityLogregFilter = Q(
    "x_quality_logreg_filter",
    (s, dir) => {
      val docs = t(s, dir, "documents")
      val labeled = docs.join(
        Text.gopherRules(docs, "text", "doc_id")
          .select(col("doc_id"), col("pass").as("label")), "doc_id")
      Model.logRegFilter(labeled, "text", "doc_id", "label",
          dims = lrDims, iters = lrIters, step = lrStep)
        .orderBy(col("doc_id"))
    },
    Some(s"""WITH ${logRegCtes(lrDims, lrIters, lrStep)}
      SELECT doc_id, n_tokens, CAST(z AS DOUBLE) AS score,
        CAST(p AS DOUBLE) AS p, label,
        (z > CAST(0 AS DECIMAL(2,0))) AS predicted,
        ((z > CAST(0 AS DECIMAL(2,0))) = label) AS correct
      FROM lpf JOIN llab USING (doc_id) ORDER BY doc_id"""),
    // the engine's one iteratively-trained loop: a cross-round perf
    // trace for the 30-step × 2-pass GD pattern
    bench = true)

  /** The registered tagger phrase list — drawn from the corpus
    * vocabulary so every length class actually fires at sf0.01:
    * singles, bigrams (incl. the self-overlapping "a a" / "batch
    * batch"), and a trigram. Shared verbatim with the oracle's VALUES
    * list (the blockedDomains convention).
    */
  private[queries] val tagPhrases = Seq("batch batch", "batch batch batch",
    "table scan", "join order", "hash join", "spark", "the fast",
    "group query", "a a")

  /** Aho–Corasick multi-phrase tagger ([[graft.ext.Phrase.phraseMatch]]):
    * per (doc, phrase) occurrence counts at token boundaries, overlaps
    * and nested phrases included, ONE token pass for all phrases of
    * all lengths. The oracle is the compositional shape the automaton
    * collapses — one n-gram join per distinct phrase length — so the
    * single-pass kernel adjudicates against the join semantics
    * position-for-position.
    */
  val xTextPhraseTags = Q(
    "x_text_phrase_tags",
    (s, dir) => graft.ext.Phrase.phraseMatch(
        t(s, dir, "documents"), "text", "doc_id", tagPhrases)
      .orderBy(col("doc_id"), col("phrase")),
    Some(s"""WITH ph AS (SELECT * FROM (VALUES
        ${tagPhrases.map(p => s"('$p')").mkString(", ")}) t(phrase)),
      phl AS (SELECT phrase,
          CAST(len(string_split(phrase, ' ')) AS BIGINT) AS l FROM ph),
      tk AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      lens AS (SELECT DISTINCT l FROM phl),
      dg AS (SELECT doc_id, l,
          unnest(list_transform(range(1, len(w) - l + 2),
            i -> array_to_string(w[i:i+l-1], ' '))) AS gram
        FROM tk JOIN lens ON len(w) >= l)
      SELECT doc_id, phrase, CAST(COUNT(*) AS BIGINT) AS n_matches
      FROM dg JOIN phl ON dg.l = phl.l AND dg.gram = phl.phrase
      GROUP BY 1, 2 ORDER BY doc_id, phrase"""))

  /** The shared prefix-doubling replay: globally numbered positions
    * (sentinels between docs), rank₁ = MIN(p) per token, then five
    * doubling rounds — each a self-join at offset L and a window MIN
    * over the (rank, partner) pair, COALESCE(−p) for off-corpus
    * partners — mirroring [[graft.ext.Suffix.dyadicRanks]] round for
    * round. Ends at `srk32`.
    */
  private[queries] val suffixCtes = """sraw AS (SELECT doc_id,
        CAST(generate_subscripts(w, 1) AS BIGINT) AS i, unnest(w) AS tok
      FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)),
    spos AS MATERIALIZED (SELECT row_number() OVER (ORDER BY doc_id, i)
        AS p, doc_id, i, tok FROM (
      SELECT * FROM sraw WHERE length(tok) > 0
      UNION ALL SELECT doc_id, 9223372036854775807,
        ' ' || CAST(doc_id AS VARCHAR) AS tok FROM documents)),
    srk1 AS MATERIALIZED (SELECT p, MIN(p) OVER (PARTITION BY tok)
        AS rank FROM spos),
    srk2 AS MATERIALIZED (SELECT a.p, MIN(a.p) OVER (PARTITION BY
        a.rank, COALESCE(b.rank, -a.p)) AS rank
      FROM srk1 a LEFT JOIN srk1 b ON b.p = a.p + 1),
    srk4 AS MATERIALIZED (SELECT a.p, MIN(a.p) OVER (PARTITION BY
        a.rank, COALESCE(b.rank, -a.p)) AS rank
      FROM srk2 a LEFT JOIN srk2 b ON b.p = a.p + 2),
    srk8 AS MATERIALIZED (SELECT a.p, MIN(a.p) OVER (PARTITION BY
        a.rank, COALESCE(b.rank, -a.p)) AS rank
      FROM srk4 a LEFT JOIN srk4 b ON b.p = a.p + 4),
    srk16 AS MATERIALIZED (SELECT a.p, MIN(a.p) OVER (PARTITION BY
        a.rank, COALESCE(b.rank, -a.p)) AS rank
      FROM srk8 a LEFT JOIN srk8 b ON b.p = a.p + 8),
    srk32 AS MATERIALIZED (SELECT a.p, MIN(a.p) OVER (PARTITION BY
        a.rank, COALESCE(b.rank, -a.p)) AS rank
      FROM srk16 a LEFT JOIN srk16 b ON b.p = a.p + 16)"""

  /** Dyadic duplication profile ([[graft.ext.Suffix.dupProfile]]):
    * duplicate-group and duplicate-position counts at span lengths
    * 1–32, via suffix-array prefix doubling — exact (no hashing), one
    * 16-byte join key at every length. Every doubling round is
    * replayed, so a wrong rank anywhere cascades into every longer
    * level's row.
    */
  val xDedupSuffixProfile = Q(
    "x_dedup_suffix_profile",
    (s, dir) => graft.ext.Suffix.dupProfile(
        t(s, dir, "documents"), "text", "doc_id", maxLen = 32)
      .orderBy(col("span_len")),
    Some(s"""WITH $suffixCtes
      SELECT * FROM (
        SELECT CAST(1 AS INTEGER) AS span_len,
            CAST(COUNT(*) AS BIGINT) AS n_dup_groups,
            CAST(COALESCE(SUM(n), 0) AS BIGINT) AS n_dup_positions
          FROM (SELECT rank, COUNT(*) AS n FROM srk1 GROUP BY 1
            HAVING COUNT(*) >= 2)
        UNION ALL SELECT 2, COUNT(*), CAST(COALESCE(SUM(n), 0) AS BIGINT)
          FROM (SELECT rank, COUNT(*) AS n FROM srk2 GROUP BY 1
            HAVING COUNT(*) >= 2)
        UNION ALL SELECT 4, COUNT(*), CAST(COALESCE(SUM(n), 0) AS BIGINT)
          FROM (SELECT rank, COUNT(*) AS n FROM srk4 GROUP BY 1
            HAVING COUNT(*) >= 2)
        UNION ALL SELECT 8, COUNT(*), CAST(COALESCE(SUM(n), 0) AS BIGINT)
          FROM (SELECT rank, COUNT(*) AS n FROM srk8 GROUP BY 1
            HAVING COUNT(*) >= 2)
        UNION ALL SELECT 16, COUNT(*), CAST(COALESCE(SUM(n), 0) AS BIGINT)
          FROM (SELECT rank, COUNT(*) AS n FROM srk16 GROUP BY 1
            HAVING COUNT(*) >= 2)
        UNION ALL SELECT 32, COUNT(*), CAST(COALESCE(SUM(n), 0) AS BIGINT)
          FROM (SELECT rank, COUNT(*) AS n FROM srk32 GROUP BY 1
            HAVING COUNT(*) >= 2)
      ) ORDER BY span_len"""),
    // the heavy face: 5 doubling rounds over the corpus position
    // table — a cross-round perf trace for the join+window ladder
    bench = true)

  /** Top duplicated 32-token spans ([[graft.ext.Suffix.topDupSpans]]):
    * occurrence count, first position (the group id), reconstructed
    * text. At sf0.01 the top spans occur 3× — near-identical docs the
    * corpus generator plants — and the reconstruction is verified by
    * the oracle slicing the SAME numbered position table.
    */
  val xDedupSuffixSpans = Q(
    "x_dedup_suffix_spans",
    (s, dir) => graft.ext.Suffix.topDupSpans(
        t(s, dir, "documents"), "text", "doc_id", spanLen = 32, k = 20)
      .orderBy(col("rnk")),
    Some(s"""WITH $suffixCtes,
      sg AS (SELECT rank AS first_pos,
          CAST(COUNT(*) AS BIGINT) AS n_occurrences
        FROM srk32 GROUP BY 1 HAVING COUNT(*) >= 2),
      stop AS (SELECT first_pos, n_occurrences,
          CAST(row_number() OVER (ORDER BY n_occurrences DESC, first_pos)
            AS INTEGER) AS rnk
        FROM sg QUALIFY rnk <= 20)
      SELECT rnk, n_occurrences, first_pos,
        (SELECT array_to_string(list(tok ORDER BY p), ' ') FROM spos
          WHERE p >= first_pos AND p < first_pos + 32) AS span_text
      FROM stop ORDER BY rnk"""))

  /** Kneser–Ney under a train/score split
    * ([[Text.bigramKneserNeyUnder]], model = even doc_ids, scored =
    * odd) — the face where KN's backoff arm actually FIRES: scored
    * bigrams absent from the model corpus (plentiful across the
    * split) take max(c−d, 0) = 0 and score purely on the continuation
    * product, which the self face never exercises. The oracle
    * replays the split training, the LEFT bigram join with the
    * clipped-to-zero first term, and the unigram-level OOV inner
    * joins.
    */
  val xTextBigramKnSplit = Q(
    "x_text_bigram_kn_split",
    (s, dir) => {
      val docs = t(s, dir, "documents")
      Text.bigramKneserNeyUnder(
          docs.filter(col("doc_id") % 2 === 1),
          docs.filter(col("doc_id") % 2 === 0),
          "text", "doc_id")
        .select(col("doc_id"), col("n_bigrams"), col("sum_logprob"),
          col("mean_logprob"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH kmt AS (SELECT string_split(text, ' ') AS w
        FROM documents WHERE doc_id % 2 = 0),
      kst AS (SELECT doc_id, string_split(text, ' ') AS w
        FROM documents WHERE doc_id % 2 = 1),
      kbi AS (SELECT doc_id, gram, count(*) AS bf FROM (
          SELECT doc_id, unnest(list_transform(range(1, len(w)),
            i -> w[i] || ' ' || w[i+1])) AS gram FROM kst)
        GROUP BY 1, 2),
      kbic AS MATERIALIZED (SELECT gram, CAST(count(*) AS BIGINT) AS bcnt,
          string_split(gram, ' ')[1] AS w1,
          string_split(gram, ' ')[-1] AS w2
        FROM (SELECT unnest(list_transform(range(1, len(w)),
            i -> w[i] || ' ' || w[i+1])) AS gram FROM kmt)
        GROUP BY 1),
      kctx AS MATERIALIZED (SELECT w1, CAST(SUM(bcnt) AS DOUBLE) AS ctot,
          CAST(COUNT(*) AS DOUBLE) AS n1_fwd
        FROM kbic GROUP BY 1),
      kcont AS MATERIALIZED (SELECT w2,
          CAST(COUNT(*) AS DOUBLE) AS n1_bwd FROM kbic GROUP BY 1),
      knbt AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_bigram_types
        FROM kbic),
      kj AS (SELECT kbi.doc_id, kbi.bf,
          CAST(CAST(kbi.bf AS DOUBLE) *
            CAST(CAST(ln(
              GREATEST(CAST(COALESCE(kbic.bcnt, 0) AS DOUBLE)
                - CAST(0.75 AS DOUBLE), CAST(0 AS DOUBLE)) / ctot
              + (CAST(0.75 AS DOUBLE) * n1_fwd / ctot)
                * (n1_bwd / n_bigram_types))
            AS DECIMAL(20,12)) AS DOUBLE)
          AS DECIMAL(20,12)) AS contrib
        FROM kbi LEFT JOIN kbic USING (gram)
        JOIN kctx ON kctx.w1 = string_split(kbi.gram, ' ')[1]
        JOIN kcont ON kcont.w2 = string_split(kbi.gram, ' ')[-1], knbt)
      SELECT doc_id, CAST(SUM(bf) AS BIGINT) AS n_bigrams,
        CAST(CAST(SUM(contrib) AS DECIMAL(38,12)) AS DOUBLE) AS sum_logprob,
        CAST(CAST(SUM(contrib) AS DECIMAL(38,12)) AS DOUBLE)
          / CAST(SUM(bf) AS DOUBLE) AS mean_logprob
      FROM kj GROUP BY doc_id ORDER BY doc_id"""))

  /** Domain-level quality rollup ([[graft.ext.Web.domainQuality]],
    * threshold 0.5): per registered domain of the synthetic URL
    * (the x_url_domain construction), doc count, Gopher-pass count,
    * the pass fraction, and the block verdict — the FineWeb
    * drop-whole-bad-domains stage. Oracle rebuilds the URL, both
    * host/domain regexes, the label, and the rollup.
    */
  val xWebDomainQuality = Q(
    "x_web_domain_quality",
    (s, dir) => {
      val docs = t(s, dir, "documents")
      val labeled = docs.join(
          Text.gopherRules(docs, "text", "doc_id")
            .select(col("doc_id"), col("pass")), "doc_id")
        .withColumn("url", ExtK.urlCol)
      graft.ext.Web.domainQuality(labeled, "url", "pass",
          minPassFrac = 0.5)
        .orderBy(col("url_domain"))
    },
    Some(s"""WITH inj AS (SELECT doc_id, text AS t FROM documents),
      ${ExtI.gopherCtesSql},
      du AS (SELECT d.doc_id, gr.pass,
          lower(regexp_extract(
            'https://' || (CASE WHEN d.doc_id % 3 = 0 THEN 'www.'
              ELSE '' END)
              || d.source || '-site.'
              || (CASE WHEN d.lang = 'en' THEN 'com' ELSE 'org' END)
              || '/docs/' || d.doc_id
              || (CASE WHEN d.doc_id % 2 = 0 THEN '?ref=' || d.source
                  ELSE '' END),
            '^https?://([^/:?#]+)', 1)) AS url_host
        FROM documents d JOIN gr USING (doc_id)),
      dd AS (SELECT regexp_extract(url_host, '([^.]+\\.[^.]+)$$', 1)
          AS url_domain, pass FROM du)
      SELECT url_domain, CAST(COUNT(*) AS BIGINT) AS n_docs,
        CAST(SUM(CASE WHEN pass THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
        CAST(SUM(CASE WHEN pass THEN 1 ELSE 0 END) AS DOUBLE)
          / CAST(COUNT(*) AS DOUBLE) AS pass_frac,
        (CAST(SUM(CASE WHEN pass THEN 1 ELSE 0 END) AS DOUBLE)
          / CAST(COUNT(*) AS DOUBLE) < 0.5) AS blocked
      FROM dd GROUP BY 1 ORDER BY url_domain"""))

  /** Quality-signals v2 — the RedPajama-V2 wide-row artifact
    * (x_quality_signals, ExtM) extended with THIS round's signals,
    * one row per doc: the Kneser–Ney mean log-prob, the
    * gradient-trained classifier's logit and verdict, total phrase-tag
    * hits, and the doc's registered domain with its rollup verdict.
    * The oracle chains the full KN replay, the complete 30-iteration
    * GD replay, the per-length phrase-join replay, and the domain
    * rollup into ONE wide row — drift in ANY of the four new operator
    * families flips the hash.
    *
    * Scale shape: each signal is its audited operator; assembly is
    * doc_id equi-joins plus one O(domains) broadcast — the "write the
    * signals parquet beside the corpus" job.
    */
  /** The v2 wide-row assembly, factored so the full sidecar
    * (`x_quality_signals_full`, v3 ⋈ v2) rides the IDENTICAL engine
    * chain — the shared-CTE discipline on the engine side.
    */
  private[queries] def signalsV2Df(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
      val docs = t(s, dir, "documents")
      val gop = Text.gopherRules(docs, "text", "doc_id")
        .select(col("doc_id"), col("pass"))
      val labeled = docs.join(gop.withColumnRenamed("pass", "label"), "doc_id")
      val kn = Text.bigramKneserNey(docs, "text", "doc_id")
        .select(col("doc_id"), col("mean_logprob").as("kn_mean_logprob"))
      val lr = Model.logRegFilter(labeled, "text", "doc_id", "label",
          dims = lrDims, iters = lrIters, step = lrStep)
        .select(col("doc_id"), col("score").as("lr_score"),
          col("predicted").as("lr_pass"))
      val tags = graft.ext.Phrase.phraseMatch(docs, "text", "doc_id",
          tagPhrases)
        .groupBy(col("doc_id"))
        .agg(sum(col("n_matches")).cast("bigint").as("n_tag_hits"))
      val withUrl = docs.withColumn("url", ExtK.urlCol)
      val docDom = graft.ext.Web.withUrlParts(withUrl, "url")
        .select(col("doc_id"), col("url_domain"))
      val dom = graft.ext.Web.domainQuality(
          withUrl.join(gop, "doc_id"), "url", "pass", minPassFrac = 0.5)
        .select(col("url_domain"), col("pass_frac").as("domain_pass_frac"),
          col("blocked").as("domain_blocked"))
      docs.select(col("doc_id"))
        .join(kn, Seq("doc_id"), "left")
        .join(lr, Seq("doc_id"), "left")
        .join(tags, Seq("doc_id"), "left")
        .join(docDom, "doc_id")
        .join(broadcast(dom), "url_domain")
        .select(col("doc_id"), col("kn_mean_logprob"), col("lr_score"),
          col("lr_pass"), coalesce(col("n_tag_hits"), lit(0L)).as("n_tag_hits"),
          col("url_domain"), col("domain_pass_frac"), col("domain_blocked"))
  }

  val xQualitySignalsV2 = Q(
    "x_quality_signals_v2",
    (s, dir) => signalsV2Df(s, dir).orderBy(col("doc_id")),
    Some(s"""WITH ${logRegCtes(lrDims, lrIters, lrStep)},
      tk AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      bi AS (SELECT doc_id, gram, count(*) AS bf FROM (
          SELECT doc_id, unnest(list_transform(range(1, len(w)),
            i -> w[i] || ' ' || w[i+1])) AS gram FROM tk)
        GROUP BY 1, 2),
      bic AS MATERIALIZED (SELECT gram, CAST(SUM(bf) AS BIGINT) AS bcnt,
          string_split(gram, ' ')[1] AS w1,
          string_split(gram, ' ')[-1] AS w2
        FROM bi GROUP BY 1),
      ctx AS MATERIALIZED (SELECT w1, CAST(SUM(bcnt) AS DOUBLE) AS ctot,
          CAST(COUNT(*) AS DOUBLE) AS n1_fwd
        FROM bic GROUP BY 1),
      cont AS MATERIALIZED (SELECT w2, CAST(COUNT(*) AS DOUBLE) AS n1_bwd
        FROM bic GROUP BY 1),
      nbt AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_bigram_types FROM bic),
      knj AS (SELECT bi.doc_id, bi.bf,
          CAST(CAST(bi.bf AS DOUBLE) *
            CAST(CAST(ln(
              GREATEST(CAST(bcnt AS DOUBLE) - CAST(0.75 AS DOUBLE),
                CAST(0 AS DOUBLE)) / ctot
              + (CAST(0.75 AS DOUBLE) * n1_fwd / ctot)
                * (n1_bwd / n_bigram_types))
            AS DECIMAL(20,12)) AS DOUBLE)
          AS DECIMAL(20,12)) AS contrib
        FROM bi JOIN bic USING (gram)
        JOIN ctx ON ctx.w1 = bic.w1
        JOIN cont ON cont.w2 = bic.w2, nbt),
      knq AS (SELECT doc_id,
          CAST(CAST(SUM(contrib) AS DECIMAL(38,12)) AS DOUBLE)
            / CAST(SUM(bf) AS DOUBLE) AS kn_mean_logprob
        FROM knj GROUP BY doc_id),
      ph AS (SELECT * FROM (VALUES
        ${tagPhrases.map(p => s"('$p')").mkString(", ")}) t(phrase)),
      phl AS (SELECT phrase,
          CAST(len(string_split(phrase, ' ')) AS BIGINT) AS l FROM ph),
      plens AS (SELECT DISTINCT l FROM phl),
      pdg AS (SELECT doc_id, l,
          unnest(list_transform(range(1, len(w) - l + 2),
            i -> array_to_string(w[i:i+l-1], ' '))) AS gram
        FROM tk JOIN plens ON len(w) >= l),
      ptags AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tag_hits
        FROM pdg JOIN phl ON pdg.l = phl.l AND pdg.gram = phl.phrase
        GROUP BY 1),
      du AS (SELECT d.doc_id, gr.pass,
          lower(regexp_extract(
            'https://' || (CASE WHEN d.doc_id % 3 = 0 THEN 'www.'
              ELSE '' END)
              || d.source || '-site.'
              || (CASE WHEN d.lang = 'en' THEN 'com' ELSE 'org' END)
              || '/docs/' || d.doc_id
              || (CASE WHEN d.doc_id % 2 = 0 THEN '?ref=' || d.source
                  ELSE '' END),
            '^https?://([^/:?#]+)', 1)) AS url_host
        FROM documents d JOIN gr USING (doc_id)),
      dd AS (SELECT doc_id, regexp_extract(url_host, '([^.]+\\.[^.]+)$$', 1)
          AS url_domain, pass FROM du),
      ddom AS (SELECT url_domain,
          CAST(SUM(CASE WHEN pass THEN 1 ELSE 0 END) AS DOUBLE)
            / CAST(COUNT(*) AS DOUBLE) AS domain_pass_frac,
          (CAST(SUM(CASE WHEN pass THEN 1 ELSE 0 END) AS DOUBLE)
            / CAST(COUNT(*) AS DOUBLE) < 0.5) AS domain_blocked
        FROM dd GROUP BY 1)
      SELECT d.doc_id, knq.kn_mean_logprob,
        CAST(lpf.z AS DOUBLE) AS lr_score,
        (lpf.z > CAST(0 AS DECIMAL(2,0))) AS lr_pass,
        COALESCE(ptags.n_tag_hits, 0) AS n_tag_hits,
        dd.url_domain, ddom.domain_pass_frac, ddom.domain_blocked
      FROM documents d
      LEFT JOIN knq USING (doc_id)
      LEFT JOIN lpf USING (doc_id)
      LEFT JOIN ptags USING (doc_id)
      JOIN dd USING (doc_id)
      JOIN ddom USING (url_domain)
      ORDER BY d.doc_id"""))

  /** Exact duplicated-span excision
    * ([[graft.ext.Suffix.exciseDupSpans]], spanLen 32) — the Lee et
    * al. dedup ACTION on the rank ladder: every non-first occurrence
    * of a duplicated 32-token window kills its positions; docs
    * rebuild from the kept tokens. The oracle replays the ladder, the
    * p ≠ rank mark, the offsets explode, the anti-join, and the
    * per-doc rebuild — and the whole chain rides the SAME shared
    * suffixCtes as the profile/spans queries, so the three can never
    * drift.
    */
  /** The span-32 excision replay — shared verbatim by the raw face
    * and the r17 exact-first-collapse face (`x_dedup_suffix_excise_first`,
    * ExtO): one oracle, two engine faces, byte-identical outputs
    * required.
    */
  private[queries] val suffixExciseOracleSql: String =
    s"""WITH $suffixCtes,
      smark AS (SELECT p FROM srk32 WHERE p != rank),
      skill AS (SELECT DISTINCT smark.p + js.o AS p
        FROM smark CROSS JOIN (SELECT unnest(range(0, 32)) AS o) js),
      skept AS (SELECT s.doc_id, s.p, s.tok FROM spos s
        LEFT JOIN skill k ON s.p = k.p
        WHERE k.p IS NULL AND s.i != 9223372036854775807),
      sagg AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept_tokens,
          array_to_string(list(tok ORDER BY p), ' ') AS deduped_text
        FROM skept GROUP BY 1)
      SELECT d.doc_id, COALESCE(sagg.deduped_text, '') AS deduped_text,
        COALESCE(sagg.n_kept_tokens, 0) AS n_kept_tokens
      FROM documents d LEFT JOIN sagg USING (doc_id)
      ORDER BY d.doc_id"""

  val xDedupSuffixExcise = Q(
    "x_dedup_suffix_excise",
    (s, dir) => graft.ext.Suffix.exciseDupSpans(
        t(s, dir, "documents"), "text", "doc_id", spanLen = 32)
      .orderBy(col("doc_id")),
    Some(suffixExciseOracleSql))

  /** Incremental domain rollup through the REAL streaming state
    * machinery ([[graft.streaming.DomainStream.applyBatch]], the
    * corpus arriving as three `doc_id mod 3` micro-batches against a
    * fresh generation-addressed state dir): the final cumulative
    * rollup. The oracle replays the three batch folds as chained
    * full-join CTEs (per-batch domain counts merged into the running
    * totals, batch by batch — the x_shard_assign_incremental
    * convention), so the engine's generation reads/writes must
    * reproduce plain running sums.
    */
  val xWebDomainQualityIncremental = Q(
    "x_web_domain_quality_incremental",
    (s, dir) => {
      val docs = t(s, dir, "documents")
      val labeled = docs.join(
          Text.gopherRules(docs, "text", "doc_id")
            .select(col("doc_id"), col("pass")), "doc_id")
        .withColumn("url", ExtK.urlCol)
      val statePath = H.tempStateDir("graft_domain_state") + "/state"
      (0 until 2).foreach { b =>
        graft.streaming.DomainStream.applyBatch(
          labeled.filter(pmod(col("doc_id"), lit(3)) === b),
          statePath, "url", "pass", minPassFrac = 0.5, batchId = b)
      }
      graft.streaming.DomainStream.applyBatch(
          labeled.filter(pmod(col("doc_id"), lit(3)) === 2),
          statePath, "url", "pass", minPassFrac = 0.5, batchId = 2)
        .orderBy(col("url_domain"))
    },
    Some(s"""WITH inj AS (SELECT doc_id, text AS t FROM documents),
      ${ExtI.gopherCtesSql},
      idd AS (SELECT d.doc_id,
          regexp_extract(lower(regexp_extract(
            'https://' || (CASE WHEN d.doc_id % 3 = 0 THEN 'www.'
              ELSE '' END)
              || d.source || '-site.'
              || (CASE WHEN d.lang = 'en' THEN 'com' ELSE 'org' END)
              || '/docs/' || d.doc_id
              || (CASE WHEN d.doc_id % 2 = 0 THEN '?ref=' || d.source
                  ELSE '' END),
            '^https?://([^/:?#]+)', 1)), '([^.]+\\.[^.]+)$$', 1)
            AS url_domain, gr.pass
        FROM documents d JOIN gr USING (doc_id)),
      itb0 AS (SELECT url_domain, CAST(COUNT(*) AS BIGINT) AS n,
          CAST(SUM(CASE WHEN pass THEN 1 ELSE 0 END) AS BIGINT) AS np
        FROM idd WHERE doc_id % 3 = 0 GROUP BY 1),
      itb1 AS (SELECT url_domain, CAST(COUNT(*) AS BIGINT) AS n,
          CAST(SUM(CASE WHEN pass THEN 1 ELSE 0 END) AS BIGINT) AS np
        FROM idd WHERE doc_id % 3 = 1 GROUP BY 1),
      itb2 AS (SELECT url_domain, CAST(COUNT(*) AS BIGINT) AS n,
          CAST(SUM(CASE WHEN pass THEN 1 ELSE 0 END) AS BIGINT) AS np
        FROM idd WHERE doc_id % 3 = 2 GROUP BY 1),
      ifs2 AS (SELECT COALESCE(a.url_domain, b.url_domain) AS url_domain,
          COALESCE(a.n, 0) + COALESCE(b.n, 0) AS n,
          COALESCE(a.np, 0) + COALESCE(b.np, 0) AS np
        FROM itb0 a FULL JOIN itb1 b USING (url_domain)),
      ifs3 AS (SELECT COALESCE(a.url_domain, b.url_domain) AS url_domain,
          CAST(COALESCE(a.n, 0) + COALESCE(b.n, 0) AS BIGINT) AS n_docs,
          CAST(COALESCE(a.np, 0) + COALESCE(b.np, 0) AS BIGINT) AS n_pass
        FROM ifs2 a FULL JOIN itb2 b USING (url_domain))
      SELECT url_domain, n_docs, n_pass,
        CAST(n_pass AS DOUBLE) / CAST(n_docs AS DOUBLE) AS pass_frac,
        (CAST(n_pass AS DOUBLE) / CAST(n_docs AS DOUBLE) < 0.5) AS blocked
      FROM ifs3 ORDER BY url_domain"""))

  /** The loop-tail injection (the encGarbage convention — shared
    * engine/oracle constants): docs ≡ 0 mod 6 gain a period-1 tail of
    * four repeats, docs ≡ 3 mod 6 a period-2 tail of two repeats; the
    * rest keep whatever period-1 tails the corpus naturally has
    * (adjacent equal tokens).
    */
  private def loopTail = concat(
    when(pmod(col("doc_id"), lit(6)) === 0, lit(" ha ha ha ha"))
      .otherwise(lit("")),
    when(pmod(col("doc_id"), lit(6)) === 3, lit(" la di la di"))
      .otherwise(lit("")))

  private val loopTailSql = """CASE WHEN doc_id % 6 = 0
        THEN ' ha ha ha ha' ELSE '' END ||
      CASE WHEN doc_id % 6 = 3 THEN ' la di la di' ELSE '' END"""

  /** The full/tail-period cascade, mirrored: list-slice equality with
    * clamped bounds, smaller periods and counts tested first.
    */
  private[queries] def loopCaseSql(maxPeriod: Int, maxRepeats: Int): String = {
    def fp(p: Int) =
      s"(n > $p AND w[1:n-$p] = w[${p + 1}:n])"
    def last(p: Int) = s"w[n-${p - 1}:n]"
    def m(k: Int, p: Int) =
      s"(n >= ${(k + 1) * p} AND w[n-${(k + 1) * p - 1}:n-${k * p}] = ${last(p)})"
    val minP = (1 to maxPeriod)
      .map(p => s"WHEN ${fp(p)} THEN $p").mkString(" ")
    val tailP = (1 to maxPeriod)
      .map(p => s"WHEN ${m(1, p)} THEN $p").mkString(" ")
    val reps = (1 to maxPeriod).map { p =>
      val ks = (1 until maxRepeats)
        .map(k => s"WHEN NOT ${m(k, p)} THEN $k").mkString(" ")
      s"WHEN tail_period = $p THEN (CASE $ks ELSE $maxRepeats END)"
    }.mkString(" ")
    s"""lcq AS (SELECT doc_id, CAST(n AS BIGINT) AS n_words,
        CAST(CASE $minP ELSE NULL END AS INTEGER) AS min_period,
        CAST(CASE $tailP ELSE NULL END AS INTEGER) AS tail_period
      FROM (SELECT doc_id, w, len(w) AS n FROM ltk)),
      lcr AS (SELECT lcq.doc_id, n_words, min_period, tail_period,
        CAST(CASE $reps ELSE NULL END AS INTEGER) AS tail_repeats
      FROM lcq JOIN (SELECT doc_id, w, len(w) AS n FROM ltk) t
        ON t.doc_id = lcq.doc_id)"""
  }

  /** Degenerate-repetition loop tagger ([[Text.repetitionLoop]], over
    * the loop-tail injection): full-text minimal period, trailing
    * loop period, and trailing repeat count per doc — the
    * "generation stuck in a loop" detector. The oracle mirrors every
    * clamped slice comparison and both minimality cascades.
    */
  val xTextRepetitionLoop = Q(
    "x_text_repetition_loop",
    (s, dir) => {
      val docs = t(s, dir, "documents")
      val inj = docs.select(col("doc_id"),
        concat(col("text"), loopTail).as("t"))
      Text.repetitionLoop(inj, "t", "doc_id").orderBy(col("doc_id"))
    },
    Some(s"""WITH ltk AS (SELECT doc_id,
        string_split(text || $loopTailSql, ' ') AS w FROM documents),
      ${loopCaseSql(4, 8)}
      SELECT doc_id, n_words, min_period, tail_period, tail_repeats
      FROM lcr ORDER BY doc_id"""))

  /** Blocklist redaction ([[graft.ext.Phrase.phraseRedact]], same
    * phrase list as the tagger): every token covered by any phrase
    * occurrence removed (overlap union), docs rebuilt. The oracle
    * re-finds every occurrence per length (lateral position grams),
    * explodes the covered positions, anti-joins, and rebuilds —
    * the excise-oracle shape on the tagger's match set.
    */
  val xTextPhraseRedact = Q(
    "x_text_phrase_redact",
    (s, dir) => graft.ext.Phrase.phraseRedact(
        t(s, dir, "documents"), "text", "doc_id", tagPhrases)
      .orderBy(col("doc_id")),
    Some(s"""WITH ph AS (SELECT * FROM (VALUES
        ${tagPhrases.map(p => s"('$p')").mkString(", ")}) t(phrase)),
      phl AS (SELECT phrase,
          CAST(len(string_split(phrase, ' ')) AS BIGINT) AS l FROM ph),
      rtk AS (SELECT doc_id, string_split(text, ' ') AS w
        FROM documents),
      rlen AS (SELECT DISTINCT l FROM phl),
      rg AS (SELECT t.doc_id, CAST(u.i AS BIGINT) AS start, r.l,
          array_to_string(t.w[u.i:u.i+r.l-1], ' ') AS gram
        FROM rtk t JOIN rlen r ON len(t.w) >= r.l,
          unnest(range(1, len(t.w) - r.l + 2)) u(i)),
      rmark AS (SELECT rg.doc_id, rg.start, rg.l
        FROM rg JOIN phl ON rg.l = phl.l AND rg.gram = phl.phrase),
      rm AS (SELECT DISTINCT m.doc_id, m.start + u.o AS pos
        FROM rmark m, unnest(range(0, m.l)) u(o)),
      rpos AS (SELECT doc_id,
          CAST(generate_subscripts(w, 1) AS BIGINT) AS pos,
          unnest(w) AS tok
        FROM rtk),
      rkept AS (SELECT p.doc_id, p.pos, p.tok FROM rpos p
        LEFT JOIN rm ON rm.doc_id = p.doc_id AND rm.pos = p.pos
        WHERE rm.pos IS NULL),
      ragg AS (SELECT doc_id,
          CAST(COUNT(*) AS BIGINT) AS n_kept,
          array_to_string(list(tok ORDER BY pos), ' ') AS redacted_text
        FROM rkept GROUP BY 1)
      SELECT d.doc_id,
        COALESCE(ragg.redacted_text, '') AS redacted_text,
        CAST(len(string_split(d.text, ' ')) - COALESCE(ragg.n_kept, 0)
          AS BIGINT) AS n_removed_tokens
      FROM documents d LEFT JOIN ragg USING (doc_id)
      ORDER BY d.doc_id"""))

  /** EXACT longest duplicated span ([[graft.ext.Suffix.maxDupSpan]],
    * base 32, ext cap 160): the Lee et al. headline statistic, not
    * dyadic-capped — 93 tokens at sf0.01 (a near-whole-doc
    * duplicate). The oracle replays the ladder, the in-group pair
    * set, and every pair's token-by-token extension to its first
    * mismatch.
    */
  val xDedupSuffixMaxlen = Q(
    "x_dedup_suffix_maxlen",
    (s, dir) => graft.ext.Suffix.maxDupSpan(
      t(s, dir, "documents"), "text", "doc_id", baseLen = 32,
      maxExt = 160),
    Some(s"""WITH $suffixCtes,
      mprs AS (SELECT a.p AS pa, b.p AS pb FROM srk32 a
        JOIN srk32 b ON a.rank = b.rank AND a.p < b.p),
      mext AS (SELECT pa, pb,
          COALESCE((SELECT CAST(MIN(u.o) AS BIGINT)
            FROM unnest(range(32, 160)) u(o)
            JOIN spos x ON x.p = mprs.pa + u.o
            JOIN spos y ON y.p = mprs.pb + u.o
            WHERE x.tok != y.tok), 160) AS lcp
        FROM mprs)
      SELECT CAST(MAX(lcp) AS BIGINT) AS max_dup_len,
        CAST(COUNT(*) AS BIGINT) AS n_pairs,
        CAST(SUM(CASE WHEN lcp = (SELECT MAX(lcp) FROM mext)
          THEN 1 ELSE 0 END) AS BIGINT) AS n_pairs_at_max,
        COALESCE(MAX(lcp) = 160, FALSE) AS saturated
      FROM mext"""))

  val queries: Seq[Q] = Seq(xTextBigramKn, xQualityLogregTrain,
    xQualityLogregFilter, xTextPhraseTags, xDedupSuffixProfile,
    xDedupSuffixSpans, xTextBigramKnSplit, xWebDomainQuality,
    xQualitySignalsV2, xDedupSuffixExcise, xWebDomainQualityIncremental,
    xTextRepetitionLoop, xTextPhraseRedact, xDedupSuffixMaxlen)
}
