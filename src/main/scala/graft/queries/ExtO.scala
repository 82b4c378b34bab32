package graft.queries

import org.apache.spark.sql.functions._
import graft.ext.{Text, Web}
import H.t

/** Round-17 operators: Kneser–Ney fluency-bucket twins for the CCNet
  * cut (CCNet's reference models are KN-smoothed — Wenzek et al. 2020
  * score under KenLM; the engine's JM face stays as the cheaper twin,
  * with the bucket agreement rate measured and adjudicated), and the
  * LEARNED domain blocklist — the actual FineWeb move (Penedo et al.
  * 2024): derive the blocked-domain list from the corpus's own
  * per-domain quality rollup instead of a static list, then cut the
  * blocked domains' documents.
  */
object ExtO {

  /** CCNet perplexity buckets under the Kneser–Ney LM
    * ([[Text.perplexityBucketsKn]], d = 0.75, 3 buckets): every
    * scoreable doc's rank and head/middle/tail bucket under the
    * KN-smoothed reference model. The oracle chains the shared KN
    * replay ([[ExtN.knLmCtes]]) into the same rank + integer floor cut
    * as the JM face — the two bucket faces ride ONE LM definition
    * each, so drift in either LM or either cut flips a hash.
    */
  val xQualityPplBucketsKn = Q(
    "x_quality_ppl_buckets_kn",
    (s, dir) => Text.perplexityBucketsKn(t(s, dir, "documents"), "text",
        "doc_id", nBuckets = 3)
      .orderBy(col("rn")),
    Some(s"""WITH ${ExtN.knLmCtes("")},
      knrk AS (SELECT doc_id, n_bigrams, mean_logprob,
          CAST(row_number() OVER (ORDER BY mean_logprob DESC, doc_id)
            AS BIGINT) AS rn,
          CAST(COUNT(*) OVER () AS BIGINT) AS n
        FROM knlpq),
      knbk AS (SELECT doc_id, n_bigrams, mean_logprob, rn,
          CAST(((rn - 1) * 3) // n AS INTEGER) AS bucket
        FROM knrk)
      SELECT doc_id, n_bigrams, mean_logprob, rn, bucket
      FROM knbk ORDER BY rn"""))

  /** JM-vs-KN bucket agreement — the measured column the KN upgrade
    * is judged by (the x_embed_whiten_recall convention): ONE row with
    * the scoreable doc count, how many land in the SAME head/middle/
    * tail bucket under both LMs, and the agreement fraction (a single
    * IEEE division of exact integers). The oracle chains BOTH full LM
    * replays — the JM [[Ext.bigramLmCtes]] + rank cut and the KN
    * [[ExtN.knLmCtes]] + rank cut — into one query, so a drifted count
    * in either model flips the hash.
    */
  val xQualityPplBucketAgreement = Q(
    "x_quality_ppl_bucket_agreement",
    (s, dir) => {
      val docs = t(s, dir, "documents")
      val jm = Text.perplexityBuckets(docs, "text", "doc_id", nBuckets = 3)
        .select(col("doc_id"), col("bucket").as("b_jm"))
      val kn = Text.perplexityBucketsKn(docs, "text", "doc_id",
          nBuckets = 3)
        .select(col("doc_id"), col("bucket").as("b_kn"))
      jm.join(kn, "doc_id")
        .agg(count(lit(1)).cast("bigint").as("n_docs"),
          sum(when(col("b_jm") === col("b_kn"), 1L).otherwise(0L))
            .cast("bigint").as("n_agree"))
        .select(col("n_docs"), col("n_agree"),
          (col("n_agree").cast("double") / col("n_docs").cast("double"))
            .as("agreement_frac"))
    },
    Some(s"""${Ext.bigramLmCtes},
      ${Ext.rankBucketCtes},
      ${ExtN.knLmCtes("kq")},
      kqrk AS (SELECT doc_id,
          CAST(row_number() OVER (ORDER BY mean_logprob DESC, doc_id)
            AS BIGINT) AS rn,
          CAST(COUNT(*) OVER () AS BIGINT) AS n
        FROM kqknlpq),
      kqbk AS (SELECT doc_id,
          CAST(((rn - 1) * 3) // n AS INTEGER) AS bucket
        FROM kqrk),
      agr AS (SELECT bk.doc_id, bk.bucket AS b_jm, kqbk.bucket AS b_kn
        FROM bk JOIN kqbk USING (doc_id))
      SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
        CAST(SUM(CASE WHEN b_jm = b_kn THEN 1 ELSE 0 END) AS BIGINT)
          AS n_agree,
        CAST(SUM(CASE WHEN b_jm = b_kn THEN 1 ELSE 0 END) AS DOUBLE)
          / CAST(COUNT(*) AS DOUBLE) AS agreement_frac
      FROM agr"""))

  /** LEARNED domain blocklist — the FineWeb move on the engine's own
    * rollup: per-domain Gopher pass fractions ([[Web.domainQuality]],
    * τ = 0.5) derive the blocked set FROM THE CORPUS, and blocked
    * domains' documents are cut wholesale (a failing domain's passing
    * pages are suspect too). Emitted as the 2-row attrition table
    * (the master-chain convention), so the oracle chains the full
    * rollup replay — Gopher verdicts, URL construction, both regexes,
    * the per-domain fold, the strict-< verdict — into the attrition
    * row: a drifted verdict anywhere moves row 1.
    *
    * Scale shape (100 TB): the rollup is one map-side-combinable
    * aggregation keyed by registered domain (O(domains) output); the
    * cut is a LEFT ANTI join against the BLOCKED slice only —
    * O(blocked domains) rows, broadcast here and in any real crawl.
    */
  val xPipelineLearnedBlocklist = Q(
    "x_pipeline_learned_blocklist",
    (s, dir) => {
      val docs = t(s, dir, "documents")
      val withUrl = docs.withColumn("url", ExtK.urlCol)
      val gop = Text.gopherRules(docs, "text", "doc_id")
        .select(col("doc_id"), col("pass"))
      val blocked = Web.domainQuality(withUrl.join(gop, "doc_id"),
          "url", "pass", minPassFrac = 0.5)
        .filter(col("blocked")).select(col("url_domain"))
      val kept = Web.withUrlParts(withUrl, "url")
        .select(col("doc_id"), col("text"), col("url_domain"))
        .join(broadcast(blocked), Seq("url_domain"), "left_anti")
      def row(idx: Int, name: String,
          df: org.apache.spark.sql.DataFrame) =
        df.agg(count(lit(1)).cast("bigint").as("n_docs"),
            coalesce(sum(size(split(col("text"), " ")).cast("long")),
              lit(0L)).cast("bigint").as("n_tokens"))
          .select(lit(idx).as("stage_idx"), lit(name).as("stage"),
            col("n_docs"), col("n_tokens"))
      row(0, "corpus", docs).union(row(1, "learned_domain_filter", kept))
        .orderBy(col("stage_idx"))
    },
    Some(s"""WITH inj AS (SELECT doc_id, text AS t FROM documents),
      ${ExtI.gopherCtesSql},
      ldd AS (SELECT d.doc_id, d.text,
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
      lblk AS (SELECT url_domain FROM ldd GROUP BY url_domain
        HAVING CAST(SUM(CASE WHEN pass THEN 1 ELSE 0 END) AS DOUBLE)
          / CAST(COUNT(*) AS DOUBLE) < 0.5),
      lkept AS (SELECT doc_id, text FROM ldd
        WHERE url_domain NOT IN (SELECT url_domain FROM lblk))
      SELECT * FROM (
        SELECT CAST(0 AS INTEGER) AS stage_idx, 'corpus' AS stage,
          CAST(COUNT(*) AS BIGINT) AS n_docs,
          CAST(COALESCE(SUM(len(string_split(text, ' '))), 0) AS BIGINT)
            AS n_tokens FROM documents
        UNION ALL SELECT 1, 'learned_domain_filter', COUNT(*),
          CAST(COALESCE(SUM(len(string_split(text, ' '))), 0) AS BIGINT)
          FROM lkept
      ) ORDER BY stage_idx"""))

  /** Quality-signals v3 ([[Text.qualitySignalsV3]]): the v1 wide row
    * plus the remaining adjudicated per-doc signals — repetition-loop
    * tags (min/tail period, tail repeats), encoding-garbage counts
    * (replacement/C0/C1 + the clean verdict) — one corpus pass
    * producing the complete RedPajama-V2-style sidecar (the
    * model-derived signals live in `x_quality_signals_v2`; the full
    * sidecar is v3 ⋈ v2). The REGISTERED face drops the one
    * non-oracle-expressible column, `compression_ratio` (zlib output
    * size is not a cross-engine contract — the
    * `x_text_compression_ratio` rows-only precedent; the library face
    * carries it, spec-adjudicated), so every emitted column is
    * hash-exact. The oracle chains the SHARED v1 CTEs
    * ([[ExtM.signalsV1Ctes]]), the clamped-slice loop cascade
    * ([[ExtN.loopCaseSql]]), and the master chain's encoding regexes
    * into one row — drift in ANY signal flips the hash.
    */
  val xQualitySignalsV3 = Q(
    "x_quality_signals_v3",
    (s, dir) => {
      val docs = t(s, dir, "documents")
      Text.qualitySignalsV3(docs, docs.filter(col("doc_id") < 20),
          "text", "doc_id", evalPred = Some(col("doc_id") < 20))
        .drop("compression_ratio")
        .orderBy(col("doc_id"))
    },
    Some(s"""${Ext.bigramLmCtes},
      ${Ext.rankBucketCtes},
      ${ExtM.signalsV1Ctes},
      ltk AS (SELECT doc_id, string_split(text, ' ') AS w
        FROM documents),
      ${ExtN.loopCaseSql(4, 8)},
      qenc AS (SELECT doc_id,
          CAST(length(text) - length(replace(text, chr(65533), ''))
            AS BIGINT) AS n_replacement,
          CAST(length(text) - length(regexp_replace(text,
            '[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]', '', 'g'))
            AS BIGINT) AS n_control,
          CAST(length(text) - length(regexp_replace(text,
            '[\\x80-\\x9F]', '', 'g')) AS BIGINT) AS n_c1
        FROM documents),
      $xspanCtes,
      xa AS (SELECT r.rank, r.p AS pa, d.doc_id FROM xrk4 r
        JOIN xpd d USING (p) WHERE d.doc_id >= 20),
      xb AS (SELECT r.rank, r.p AS pb FROM xrk4 r
        JOIN xpd d USING (p) WHERE d.doc_id < 20),
      xprs AS MATERIALIZED (SELECT doc_id, pa, pb
        FROM xa JOIN xb USING (rank)),
      xext AS (SELECT doc_id, pa, pb,
          COALESCE((SELECT CAST(MIN(u.o) AS BIGINT)
            FROM unnest(range(4, 160)) u(o)
            JOIN xpos x ON x.p = xprs.pa + u.o
            JOIN xpos y ON y.p = xprs.pb + u.o
            WHERE x.tok != y.tok), 160) AS lcp
        FROM xprs),
      xdep AS (SELECT doc_id, CAST(MAX(lcp) AS BIGINT) AS leak_depth
        FROM xext GROUP BY doc_id)
      ${ExtM.signalsV1Select(
        extraCols = """,
        lcr.min_period, lcr.tail_period, lcr.tail_repeats,
        qenc.n_replacement, qenc.n_control, qenc.n_c1,
        (qenc.n_replacement = 0 AND qenc.n_control = 0 AND qenc.n_c1 = 0)
          AS encoding_clean, xdep.leak_depth""",
        extraJoins = """
      JOIN lcr USING (doc_id)
      JOIN qenc USING (doc_id)
      LEFT JOIN xdep USING (doc_id)""")}"""))

  /** The continuous-curation master adjudicated END TO END — one
    * micro-batch (the whole corpus, fresh state) through the REAL
    * [[graft.streaming.CurateStream.applyBatch]] driver, its complete
    * attrition report against ONE chained oracle. With a fresh state
    * every incremental face reduces to its one-shot twin (the empty
    * history makes the state probes no-ops), so the oracle composes
    * the already-shared stage replays: funnel verdicts (LM + rank
    * buckets + Gopher + encoding), the per-doc intra span pass, the
    * exhaustive paragraph pair set ([[ExtI.paraDedupCtes]] — the
    * batch face the incremental provably equals on one batch), the
    * whole-doc exact-Jaccard pairwise rule with the sub-3-token
    * fallback (the master chain's stage-7 replay — the engine's
    * MinHash faces verify candidates by exact Jaccard, so band
    * recall < 1.0 fails THIS hash loudly, the
    * x_pipeline_master_lsh convention), the corpus-wide span pass +
    * length floor, and the 5-gram decontamination — every report
    * column, cumulative fold included, adjudicated. This puts the
    * DRIVER ITSELF (not just its stage library) under the oracle
    * gate; the multi-batch composition on top of it is
    * CurateStreamSpec's split-equality proof.
    */
  val xCurateStreamMaster = Q(
    "x_curate_stream_master",
    (s, dir) => {
      val docs = t(s, dir, "documents")
      // train the reference LM ONCE (r20): the pinned handle serves
      // the fluency-cutoff derivation AND the batch score — the former
      // shape trained the self face in fluencyCutoff and re-trained
      // the split face inside applyBatch on the same docs
      val lm = graft.ext.Text.bigramLmTrain(docs, "text")
      val (cutLp, cutId) = graft.streaming.FunnelStream
        .fluencyCutoff(docs, "text", "doc_id", model = Some(lm))
      val inj = docs.select(col("doc_id"), col("text"),
        concat(col("text"), ExtI.encGarbage, ExtI.gopherBait).as("tinj"))
      val evalDocs = docs.filter(col("doc_id") < 20)
      val arrivals = inj.filter(col("doc_id") >= 20)
      val statePath = H.tempStateDir("graft_curate_master") + "/state"
      val (_, report) = graft.streaming.CurateStream.applyBatch(arrivals,
        statePath, 0L, docs, cutLp, cutId, evalDocs, "text", "tinj",
        "doc_id", model = Some(lm))
      report
    },
    Some(s"""${Ext.bigramLmCtes},
      ${Ext.rankBucketCtes},
      csmc AS MATERIALIZED (SELECT doc_id, text FROM documents
        WHERE doc_id >= 20),
      inj AS (SELECT doc_id, text || ${ExtI.encGarbageSql}
          || ${ExtI.gopherBaitSql} AS t
        FROM csmc),
      enc AS (SELECT doc_id,
          ((length(t) - length(replace(t, chr(65533), ''))) = 0 AND
           (length(t) - length(regexp_replace(t,
             '[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]', '', 'g'))) = 0 AND
           (length(t) - length(regexp_replace(t,
             '[\\x80-\\x9F]', '', 'g'))) = 0) AS is_clean
        FROM inj),
      ${ExtI.gopherCtesSql},
      csms AS MATERIALIZED (SELECT c.doc_id, c.text FROM csmc c
        JOIN enc e ON e.doc_id = c.doc_id
        JOIN gr g ON g.doc_id = c.doc_id
        JOIN bk ON bk.doc_id = c.doc_id
        WHERE e.is_clean AND g.pass AND bk.bucket < 2),
      ${ExtE.spanDedupCtes("ci", "csms", 3, perDoc = true)},
      c5 AS MATERIALIZED (SELECT doc_id, deduped_text AS text
        FROM cires),
      ${ExtI.paraDedupCtes("cp", "c5")},
      c6 AS MATERIALIZED (SELECT doc_id, deduped_text AS text
        FROM cpout),
      cwd AS (SELECT doc_id, text, string_split(text, ' ') AS w FROM c6),
      cwsh AS MATERIALIZED (
        SELECT DISTINCT doc_id,
            unnest(list_transform(range(1, len(w) - 1),
              i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
          FROM cwd WHERE len(w) >= 3
        UNION ALL
        SELECT doc_id, text AS s FROM cwd WHERE len(w) < 3),
      cwcnt AS MATERIALIZED (SELECT doc_id, count(*) AS n FROM cwsh
        GROUP BY doc_id),
      cwinter AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS ix
        FROM cwsh a JOIN cwsh b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY da, db),
      cwrm AS MATERIALIZED (SELECT DISTINCT db AS doc_id FROM cwinter
        JOIN cwcnt ca ON ca.doc_id = da JOIN cwcnt cb ON cb.doc_id = db
        WHERE CAST(ix AS DOUBLE) / (ca.n + cb.n - ix) >= 0.5),
      c7 AS MATERIALIZED (SELECT * FROM c6
        WHERE doc_id NOT IN (SELECT doc_id FROM cwrm)),
      ${ExtE.spanDedupCtes("cg", "c7", 10, perDoc = false)},
      c8 AS MATERIALIZED (SELECT doc_id, deduped_text AS text,
          n_kept_tokens
        FROM cgres WHERE n_kept_tokens >= 20),
      ceg AS MATERIALIZED (SELECT DISTINCT
          unnest(list_transform(range(1, len(w) - 3),
            i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' '
              || w[i+3] || ' ' || w[i+4])) AS gram
        FROM (SELECT string_split(text, ' ') AS w FROM documents
          WHERE doc_id < 20)),
      ccg AS (SELECT DISTINCT doc_id,
          unnest(list_transform(range(1, len(w) - 3),
            i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' '
              || w[i+3] || ' ' || w[i+4])) AS gram
        FROM (SELECT doc_id, string_split(text, ' ') AS w FROM c8)),
      ccont AS (SELECT DISTINCT doc_id FROM ccg JOIN ceg USING (gram)),
      c9 AS MATERIALIZED (SELECT * FROM c8
        WHERE doc_id NOT IN (SELECT doc_id FROM ccont))
      SELECT CAST(0 AS BIGINT) AS batch_id,
        (SELECT CAST(COUNT(*) AS BIGINT) FROM csmc) AS n_arrived,
        (SELECT CAST(COUNT(*) AS BIGINT) FROM csms) AS n_screened,
        (SELECT CAST(COALESCE(SUM(n_kept_tokens), 0) AS BIGINT)
          FROM cires) AS n_intra_tokens,
        (SELECT CAST(COUNT(*) AS BIGINT) FROM c7) AS n_whole_doc,
        (SELECT CAST(COUNT(*) AS BIGINT) FROM c8) AS n_span,
        (SELECT CAST(COUNT(*) AS BIGINT) FROM c9) AS n_curated,
        (SELECT CAST(COALESCE(SUM(n_kept_tokens), 0) AS BIGINT)
          FROM c9) AS n_tokens,
        (SELECT CAST(COUNT(*) AS BIGINT) FROM csmc) AS c_arrived,
        (SELECT CAST(COUNT(*) AS BIGINT) FROM csms) AS c_screened,
        (SELECT CAST(COALESCE(SUM(n_kept_tokens), 0) AS BIGINT)
          FROM cires) AS c_intra_tokens,
        (SELECT CAST(COUNT(*) AS BIGINT) FROM c7) AS c_whole_doc,
        (SELECT CAST(COUNT(*) AS BIGINT) FROM c8) AS c_span,
        (SELECT CAST(COUNT(*) AS BIGINT) FROM c9) AS c_curated,
        (SELECT CAST(COALESCE(SUM(n_kept_tokens), 0) AS BIGINT)
          FROM c9) AS c_tokens"""),
    bench2 = true)

  /** The cross-set prefix-doubling replay to level `baseLen` = 4:
    * positions + sentinels over ALL documents (one numbering for both
    * sets), two doubling rounds, position→doc mapping — the ExtN
    * suffixCtes construction truncated at the level this query needs.
    */
  // def, not val: referenced by queries declared ABOVE this point in
  // the object (a val would interpolate as null during initialization)
  private[queries] def xspanCtes: String = """xraw AS (SELECT doc_id,
        CAST(generate_subscripts(w, 1) AS BIGINT) AS i, unnest(w) AS tok
      FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)),
    xpos AS MATERIALIZED (SELECT row_number() OVER (ORDER BY doc_id, i)
        AS p, doc_id, i, tok FROM (
      SELECT * FROM xraw WHERE length(tok) > 0
      UNION ALL SELECT doc_id, 9223372036854775807,
        ' ' || CAST(doc_id AS VARCHAR) AS tok FROM documents)),
    xrk1 AS MATERIALIZED (SELECT p, MIN(p) OVER (PARTITION BY tok)
        AS rank FROM xpos),
    xrk2 AS MATERIALIZED (SELECT a.p, MIN(a.p) OVER (PARTITION BY
        a.rank, COALESCE(b.rank, -a.p)) AS rank
      FROM xrk1 a LEFT JOIN xrk1 b ON b.p = a.p + 1),
    xrk4 AS MATERIALIZED (SELECT a.p, MIN(a.p) OVER (PARTITION BY
        a.rank, COALESCE(b.rank, -a.p)) AS rank
      FROM xrk2 a LEFT JOIN xrk2 b ON b.p = a.p + 2),
    xpd AS MATERIALIZED (SELECT p, doc_id FROM xpos
      WHERE i != 9223372036854775807)"""

  /** Cross-corpus contamination depth
    * ([[graft.ext.Suffix.contaminationSpanDepth]], base 4, cap 160):
    * per corpus doc (doc_id ≥ 20), the EXACT length of its longest
    * token span also present in the eval slice (doc_id < 20), the
    * number of DISTINCT colliding base windows (COUNT(DISTINCT pa) —
    * eval-side repetition never inflates it), and the saturation flag — the
    * overlap-audit ranking fixed-n decontamination can't produce. The
    * oracle replays the shared position numbering, both doubling
    * rounds, the cross-set pair join, and every pair's token-by-token
    * extension to first mismatch.
    */
  val xDecontaminateSpanDepth = Q(
    "x_decontaminate_span_depth",
    (s, dir) => graft.ext.Suffix.contaminationSpanDepth(
        t(s, dir, "documents"), "text", "doc_id",
        evalPred = col("doc_id") < 20, baseLen = 4, maxExt = 160)
      .orderBy(col("doc_id")),
    Some(s"""WITH $xspanCtes,
      xa AS (SELECT r.rank, r.p AS pa, d.doc_id FROM xrk4 r
        JOIN xpd d USING (p) WHERE d.doc_id >= 20),
      xb AS (SELECT r.rank, r.p AS pb FROM xrk4 r
        JOIN xpd d USING (p) WHERE d.doc_id < 20),
      xprs AS MATERIALIZED (SELECT doc_id, pa, pb
        FROM xa JOIN xb USING (rank)),
      xext AS (SELECT doc_id, pa, pb,
          COALESCE((SELECT CAST(MIN(u.o) AS BIGINT)
            FROM unnest(range(4, 160)) u(o)
            JOIN xpos x ON x.p = xprs.pa + u.o
            JOIN xpos y ON y.p = xprs.pb + u.o
            WHERE x.tok != y.tok), 160) AS lcp
        FROM xprs)
      SELECT doc_id, CAST(MAX(lcp) AS BIGINT) AS max_shared_span,
        CAST(COUNT(DISTINCT pa) AS BIGINT) AS n_base_hits,
        COALESCE(MAX(lcp) = 160, FALSE) AS saturated
      FROM xext GROUP BY doc_id ORDER BY doc_id"""))

  /** Exact span excision at Lee et al.'s OWN parameter — 50 tokens,
    * a NON-dyadic length ([[graft.ext.Suffix.exciseDupSpans]] via
    * [[graft.ext.Suffix.ranksAt]]'s overlap combine: ladder to 32,
    * one extra round at offset 18 — two overlapping 32-windows cover
    * [p, p+50) exactly). The oracle extends the shared five-round
    * suffixCtes replay with the SAME combine (srk50) and replays the
    * excision — the overlap-combine construction itself is
    * oracle-adjudicated, not only spec-checked. At sf0.01 the corpus
    * carries a 93-token duplicate, so 50-token excision is
    * non-vacuous.
    */
  val xDedupSuffixExcise50 = Q(
    "x_dedup_suffix_excise50",
    (s, dir) => graft.ext.Suffix.exciseDupSpans(
        t(s, dir, "documents"), "text", "doc_id", spanLen = 50)
      .orderBy(col("doc_id")),
    Some(s"""WITH ${ExtN.suffixCtes},
      srk50 AS MATERIALIZED (SELECT a.p, MIN(a.p) OVER (PARTITION BY
          a.rank, COALESCE(b.rank, -a.p)) AS rank
        FROM srk32 a LEFT JOIN srk32 b ON b.p = a.p + 18),
      smark AS (SELECT p FROM srk50 WHERE p != rank),
      skill AS (SELECT DISTINCT smark.p + js.o AS p
        FROM smark CROSS JOIN (SELECT unnest(range(0, 50)) AS o) js),
      skept AS (SELECT s.doc_id, s.p, s.tok FROM spos s
        LEFT JOIN skill k ON s.p = k.p
        WHERE k.p IS NULL AND s.i != 9223372036854775807),
      sagg AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept_tokens,
          array_to_string(list(tok ORDER BY p), ' ') AS deduped_text
        FROM skept GROUP BY 1)
      SELECT d.doc_id, COALESCE(sagg.deduped_text, '') AS deduped_text,
        COALESCE(sagg.n_kept_tokens, 0) AS n_kept_tokens
      FROM documents d LEFT JOIN sagg USING (doc_id)
      ORDER BY d.doc_id"""))

  /** The streaming quality funnel under the Kneser–Ney reference
    * model ([[graft.streaming.FunnelStream.applyBatch]] with
    * `kn = true` — the CCNet-faithful fluency face, since KenLM is
    * modified KN): the same three-batch order-free-prefix fold as
    * `x_curate_stream_funnel`, with the cutoff and every per-doc
    * fluency verdict riding the KN LM + its rank cut. The oracle
    * swaps ONLY the LM block (the shared [[ExtN.knLmCtes]] + the KN
    * rank cut in place of the JM chain) — encoding, Gopher, the
    * intra-doc stage, and the cumulative fold replay identically, so
    * the twin isolates the LM exchange.
    */
  val xCurateStreamFunnelKn = Q(
    "x_curate_stream_funnel_kn",
    (s, dir) => {
      val docs = t(s, dir, "documents")
      val (cutLp, cutId) = graft.streaming.FunnelStream
        .fluencyCutoff(docs, "text", "doc_id", kn = true)
      val inj = docs.select(col("doc_id"), col("text"),
        concat(col("text"), ExtI.encGarbage, ExtI.gopherBait).as("tinj"))
      val statePath = H.tempStateDir("graft_funnel_kn") + "/state"
      (0 until 3).map { b =>
        graft.streaming.FunnelStream.applyBatch(
          inj.filter(pmod(col("doc_id"), lit(3)) === b),
          statePath, b.toLong, docs, cutLp, cutId,
          "text", "tinj", "doc_id", kn = true)
      }.reduce(_.unionByName(_)).orderBy(col("batch_id"))
    },
    Some(s"""WITH ${ExtN.knLmCtes("")},
      knrk AS (SELECT doc_id,
          CAST(row_number() OVER (ORDER BY mean_logprob DESC, doc_id)
            AS BIGINT) AS rn,
          CAST(COUNT(*) OVER () AS BIGINT) AS n
        FROM knlpq),
      knbk AS (SELECT doc_id,
          CAST(((rn - 1) * 3) // n AS INTEGER) AS bucket
        FROM knrk),
      inj AS (SELECT doc_id, text || ${ExtI.encGarbageSql}
          || ${ExtI.gopherBaitSql} AS t
        FROM documents),
      enc AS (SELECT doc_id,
          ((length(t) - length(replace(t, chr(65533), ''))) = 0 AND
           (length(t) - length(regexp_replace(t,
             '[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]', '', 'g'))) = 0 AND
           (length(t) - length(regexp_replace(t,
             '[\\x80-\\x9F]', '', 'g'))) = 0) AS is_clean
        FROM inj),
      ${ExtI.gopherCtesSql},
      fl AS (SELECT e.doc_id, CAST(e.doc_id % 3 AS BIGINT) AS batch_id,
          e.is_clean, g.pass, knbk.bucket
        FROM enc e JOIN gr g USING (doc_id)
        LEFT JOIN knbk USING (doc_id)),
      flsrc AS (SELECT d.doc_id, d.text FROM documents d
        JOIN fl ON fl.doc_id = d.doc_id
        WHERE fl.is_clean AND fl.pass AND fl.bucket < 2),
      ${ExtE.spanDedupCtes("fi", "flsrc", 3, perDoc = true)},
      pb AS (SELECT batch_id,
          CAST(COUNT(*) AS BIGINT) AS n_all,
          CAST(SUM(CASE WHEN is_clean THEN 1 ELSE 0 END) AS BIGINT)
            AS n_encoding_clean,
          CAST(SUM(CASE WHEN is_clean AND pass THEN 1 ELSE 0 END)
            AS BIGINT) AS n_gopher_pass,
          CAST(SUM(CASE WHEN is_clean AND pass AND bucket < 2
            THEN 1 ELSE 0 END) AS BIGINT) AS n_fluent,
          CAST(SUM(CASE WHEN is_clean AND pass AND bucket < 2
            THEN COALESCE(fi.n_kept_tokens, 0) ELSE 0 END) AS BIGINT)
            AS n_intra_tokens
        FROM fl LEFT JOIN fires fi USING (doc_id) GROUP BY batch_id)
      SELECT batch_id, n_all, n_encoding_clean, n_gopher_pass, n_fluent,
        n_intra_tokens,
        CAST(SUM(n_all) OVER w AS BIGINT) AS c_all,
        CAST(SUM(n_encoding_clean) OVER w AS BIGINT) AS c_encoding_clean,
        CAST(SUM(n_gopher_pass) OVER w AS BIGINT) AS c_gopher_pass,
        CAST(SUM(n_fluent) OVER w AS BIGINT) AS c_fluent,
        CAST(SUM(n_intra_tokens) OVER w AS BIGINT) AS c_intra_tokens,
        CAST(SUM(n_fluent) OVER w AS DOUBLE) /
          CAST(SUM(n_all) OVER w AS DOUBLE) AS survival_frac
      FROM pb
      WINDOW w AS (ORDER BY batch_id ROWS UNBOUNDED PRECEDING)
      ORDER BY batch_id"""))

  /** The exact-first-collapse excision face
    * ([[graft.ext.Suffix.exciseDupSpansExactFirst]], span 32) against
    * the SAME text-keyed replay as the raw ladder face — byte
    * equality certifies the closed-form member reconstruction (a
    * clone with ≥ span tokens is fully excised; a shorter one is
    * intact) and the rep-verdict invariance under member removal,
    * the equivalence argued on the scaladoc.
    */
  val xDedupSuffixExciseFirst = Q(
    "x_dedup_suffix_excise_first",
    (s, dir) => graft.ext.Suffix.exciseDupSpansExactFirst(
        t(s, dir, "documents"), "text", "doc_id", spanLen = 32)
      .orderBy(col("doc_id")),
    Some(ExtN.suffixExciseOracleSql))

  /** Top leaked spans ([[graft.ext.Suffix.topLeakedSpans]], span 4,
    * k = 20): the per-SPAN leaderboard of the overlap audit — which
    * eval passages appear most across the corpus, with occurrence and
    * distinct-doc counts and the reconstructed text. The oracle rides
    * the same cross-set ladder CTEs as the depth query and replays
    * the leaderboard + the position-table reconstruction (the
    * topDupSpans convention).
    */
  val xDecontaminateTopSpans = Q(
    "x_decontaminate_top_spans",
    (s, dir) => graft.ext.Suffix.topLeakedSpans(
        t(s, dir, "documents"), "text", "doc_id",
        evalPred = col("doc_id") < 20, spanLen = 4, k = 20)
      .orderBy(col("rnk")),
    Some(s"""WITH $xspanCtes,
      lsg AS (SELECT r.rank,
          SUM(CASE WHEN d.doc_id < 20 THEN 1 ELSE 0 END) AS ne,
          CAST(SUM(CASE WHEN d.doc_id >= 20 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_corpus_occurrences,
          CAST(COUNT(DISTINCT CASE WHEN d.doc_id >= 20
            THEN d.doc_id END) AS BIGINT) AS n_corpus_docs
        FROM xrk4 r JOIN xpd d USING (p) GROUP BY r.rank
        HAVING ne > 0 AND n_corpus_occurrences > 0),
      ltop AS (SELECT rank AS first_pos, n_corpus_occurrences,
          n_corpus_docs,
          CAST(row_number() OVER (ORDER BY n_corpus_occurrences DESC,
            rank) AS INTEGER) AS rnk
        FROM lsg QUALIFY rnk <= 20)
      SELECT rnk, n_corpus_occurrences, n_corpus_docs, first_pos,
        (SELECT array_to_string(list(tok ORDER BY p), ' ') FROM xpos
          WHERE p >= first_pos AND p < first_pos + 4) AS span_text
      FROM ltop ORDER BY rnk"""))

  val queries: Seq[Q] = Seq(xQualityPplBucketsKn,
    xQualityPplBucketAgreement, xPipelineLearnedBlocklist,
    xQualitySignalsV3, xCurateStreamMaster, xDecontaminateSpanDepth,
    xDedupSuffixExcise50, xCurateStreamFunnelKn, xDedupSuffixExciseFirst,
    xDecontaminateTopSpans)
}
