package graft.queries

import org.apache.spark.sql.functions._
import graft.ext._
import H.t

/** Round-12 operators: the two crawl-standard quality filters the
  * engine still lacked (deflate compression-ratio repetition signal,
  * encoding-garbage signals) and the Dolma-style paragraph-level
  * near-dup capstone composed from the audited segment + MinHash
  * pieces.
  */
object ExtI {

  /** The doc_id-keyed garbage constructions shared by the encoding /
    * gopher / funnel queries — Scala (engine) and SQL (oracle) halves
    * of the SAME deterministic injection, kept adjacent so they can't
    * drift. Encoding garbage (U+FFFD runs, C0, C1) attaches to the last
    * word; the gopher bait adds three non-alphabetic tokens (4 symbol
    * matches: '#'×3 + '...') that push short docs over the symbol-ratio
    * and under the alpha-fraction thresholds while long docs absorb it.
    */
  private[graft] def encGarbage = concat(
    when(col("doc_id") % 7 === 0,
      expr("repeat('\uFFFD', cast(doc_id % 4 + 1 as int))"))
      .otherwise(lit("")),
    when(col("doc_id") % 5 === 0, lit("\u0007\u0001\u007F"))
      .otherwise(lit("")),
    when(col("doc_id") % 11 === 0, lit("\u0085\u0096"))
      .otherwise(lit("")))
  private[graft] def gopherBait =
    when(col("doc_id") % 13 === 0, lit(" ### ... 123")).otherwise(lit(""))
  private[queries] val encGarbageSql = """
        CASE WHEN doc_id % 7 = 0
          THEN repeat(chr(65533), CAST(doc_id % 4 + 1 AS INT)) ELSE '' END ||
        CASE WHEN doc_id % 5 = 0
          THEN chr(7) || chr(1) || chr(127) ELSE '' END ||
        CASE WHEN doc_id % 11 = 0
          THEN chr(133) || chr(150) ELSE '' END"""
  private[queries] val gopherBaitSql =
    """CASE WHEN doc_id % 13 = 0 THEN ' ### ... 123' ELSE '' END"""

  /** Gopher-signals replay over a text column `t` in relation `src`,
    * ending in `${pfx}gr(doc_id, …signals…, r_* booleans, pass)` —
    * prefixable so one oracle can carry TWO gopher chains (the r17
    * learned-blocklist master face labels the domain rollup on RAW
    * text while stage 3 screens the injected text).
    */
  private[queries] def gopherCtes(pfx: String, src: String): String = s"""
      ${pfx}sig AS (SELECT doc_id,
        CAST(len(string_split(t, ' ')) AS BIGINT) AS n_words,
        CAST(list_sum(list_transform(string_split(t, ' '),
          w -> len(w))) AS DOUBLE) / len(string_split(t, ' '))
          AS mean_word_len,
        CAST(len(regexp_extract_all(t, '#|\\.\\.\\.')) AS BIGINT) AS n_symbols,
        CAST(len(list_filter(string_split(t, ' '),
          w -> regexp_matches(w, '[a-zA-Z]'))) AS BIGINT) AS n_alpha_words,
        CAST(len(list_filter(string_split(t, ' '),
          w -> list_contains(['the','a','an','of','and','or','to','in','is','it'], w)))
          AS BIGINT) AS n_stopwords
      FROM $src),
      ${pfx}gr AS (SELECT *,
        (n_words >= 50 AND n_words <= 100000) AS r_words,
        (mean_word_len >= 3.0 AND mean_word_len <= 10.0) AS r_wordlen,
        (CAST(n_symbols AS DOUBLE) / n_words <= 0.1) AS r_symbol,
        (CAST(n_alpha_words AS DOUBLE) / n_words >= 0.8) AS r_alpha,
        (n_stopwords >= 2) AS r_stop,
        (r_words AND r_wordlen AND r_symbol AND r_alpha AND r_stop) AS pass
      FROM ${pfx}sig)"""

  private[queries] val gopherCtesSql = gopherCtes("", "inj")


  /** Compression-ratio repetition signal ([[Text.compressionRatio]],
    * raw DEFLATE level 6 via the codegen'd `deflate_len` expression).
    * Rows-only by the contract's omission rule: compressed SIZE is a
    * zlib-build constant, not a cross-engine contract (DuckDB cannot
    * deflate) — the semantics are spec-adjudicated in ExtISpec with
    * golden repetitive/natural/incompressible fixtures and the
    * determinism/ordering invariants the downstream filter relies on.
    */
  val xTextCompressionRatio = Q(
    "x_text_compression_ratio",
    (s, dir) => Text.compressionRatio(t(s, dir, "documents"), "text", "doc_id")
      .orderBy(col("doc_id")),
    None)

  /** Encoding-garbage signals ([[Text.encodingQuality]]): U+FFFD /
    * C0-control / C1-mojibake codepoint counts and fractions. The raw
    * corpus is clean (every count would be 0), so the query injects
    * deterministic garbage first — doc_id-keyed replacement runs,
    * control bytes, and C1 pairs, built with the SAME SQL-expressible
    * construction on both engines — making every signal class exercise
    * non-zero counts AND the clean rows adjudicate the false-positive
    * direction. Hash-exact: counts are codepoint arithmetic, fractions
    * one int/int double division.
    */
  val xTextEncodingQuality = Q(
    "x_text_encoding_quality",
    (s, dir) => {
      val injected = t(s, dir, "documents")
        .select(col("doc_id"), concat(col("text"), encGarbage).as("text"))
      Text.encodingQuality(injected, "text", "doc_id").orderBy(col("doc_id"))
    },
    Some(s"""WITH inj AS (SELECT doc_id, text || $encGarbageSql AS t
      FROM documents),
      m AS (SELECT doc_id, CAST(length(t) AS BIGINT) AS n_chars,
        CAST(length(t) - length(replace(t, chr(65533), '')) AS BIGINT)
          AS n_replacement,
        CAST(length(t) - length(regexp_replace(t,
          '[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]', '', 'g')) AS BIGINT)
          AS n_control,
        CAST(length(t) - length(regexp_replace(t,
          '[\\x80-\\x9F]', '', 'g')) AS BIGINT) AS n_c1
      FROM inj)
      SELECT doc_id, n_chars, n_replacement, n_control, n_c1,
        CASE WHEN n_chars > 0
          THEN CAST(n_replacement AS DOUBLE) / n_chars
          ELSE 0.0 END AS frac_replacement,
        CASE WHEN n_chars > 0
          THEN CAST(n_replacement + n_control + n_c1 AS DOUBLE) / n_chars
          ELSE 0.0 END AS frac_bad,
        (n_replacement = 0 AND n_control = 0 AND n_c1 = 0) AS is_clean
      FROM m ORDER BY doc_id"""))

  /** Paragraph-dedup replay over `src(doc_id, text)` — segmentation
    * into 20-token windows, ordered pid keys, the exhaustive
    * exact-Jaccard pair set at j ≥ 0.8 (LSH must find every true pair:
    * P(miss) ≤ 4.7e-8 each at 128 hashes / 32 bands),
    * earlier-occurrence-wins removal, and ordered re-assembly —
    * parameterized by CTE prefix and source relation so the standalone
    * paragraph query and the r14 master-recipe capstone (ExtK) replay
    * the SAME text and can never drift. Multi-referenced CTEs are
    * MATERIALIZED (sh self-joins; DuckDB re-inlines plain CTEs per
    * reference). Ends in `${pfx}out(doc_id, n_paragraphs, n_removed,
    * deduped_text, dup_frac)`.
    */
  private[queries] def paraDedupCtes(pfx: String, src: String): String =
    s"""${pfx}d AS (SELECT doc_id, string_split(text, ' ') AS toks
        FROM $src),
      ${pfx}ch AS MATERIALIZED (SELECT doc_id,
          generate_subscripts(range(0, greatest(len(toks), 1), 20), 1) - 1
            AS chunk_idx,
          unnest(range(0, greatest(len(toks), 1), 20)) AS start, toks
        FROM ${pfx}d),
      ${pfx}cx AS MATERIALIZED (SELECT doc_id, chunk_idx,
          array_to_string(toks[start + 1 : start + 20], ' ') AS chunk_text,
          least(len(toks) - start, 20) AS n_toks
        FROM ${pfx}ch),
      ${pfx}pw AS MATERIALIZED (SELECT doc_id * 1000000 + chunk_idx AS pid,
          string_split(chunk_text, ' ') AS w
        FROM ${pfx}cx WHERE n_toks >= 5),
      ${pfx}sh AS MATERIALIZED (SELECT DISTINCT pid,
          unnest(list_transform(range(1, len(w) - 1),
            i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
        FROM ${pfx}pw),
      ${pfx}cnt AS MATERIALIZED (SELECT pid, count(*) AS n FROM ${pfx}sh
        GROUP BY pid),
      ${pfx}inter AS (SELECT a.pid AS pa, b.pid AS pb, count(*) AS ix
        FROM ${pfx}sh a JOIN ${pfx}sh b ON a.s = b.s AND a.pid < b.pid
        GROUP BY pa, pb),
      ${pfx}rm AS MATERIALIZED (SELECT DISTINCT pb AS pid FROM ${pfx}inter
        JOIN ${pfx}cnt ca ON ca.pid = pa JOIN ${pfx}cnt cb ON cb.pid = pb
        WHERE CAST(ix AS DOUBLE) / (ca.n + cb.n - ix) >= 0.8),
      ${pfx}rep AS (SELECT cx.doc_id, cx.chunk_idx, cx.chunk_text,
          CASE WHEN rm.pid IS NOT NULL THEN 1 ELSE 0 END AS removed
        FROM ${pfx}cx cx LEFT JOIN ${pfx}rm rm
          ON cx.doc_id * 1000000 + cx.chunk_idx = rm.pid),
      ${pfx}out AS (SELECT doc_id,
          CAST(COUNT(*) AS BIGINT) AS n_paragraphs,
          CAST(SUM(removed) AS BIGINT) AS n_removed,
          COALESCE(string_agg(CASE WHEN removed = 0 THEN chunk_text END, ' '
            ORDER BY chunk_idx), '') AS deduped_text,
          CAST(SUM(removed) AS DOUBLE) / COUNT(*) AS dup_frac
        FROM ${pfx}rep GROUP BY doc_id)"""

  /** Dolma-style paragraph-level near-dup capstone
    * ([[Dedup.paragraphDedup]]): 20-token segments, paragraph-keyed
    * MinHash+LSH at j ≥ 0.8, earlier-occurrence-wins removal, per-doc
    * damage report with the re-assembled text adjudicated
    * byte-for-byte. The oracle replays the CHAIN via [[paraDedupCtes]].
    */
  val xPipelineParagraphDedup = Q(
    "x_pipeline_paragraph_dedup",
    (s, dir) => Dedup.paragraphDedup(t(s, dir, "documents"), "text", "doc_id",
      paraTokens = 20, minTokens = 5, threshold = 0.8, eager = false)
      .orderBy(col("doc_id")),
    Some(s"""WITH ${paraDedupCtes("", "documents")}
      SELECT doc_id, n_paragraphs, n_removed, deduped_text, dup_frac
      FROM out ORDER BY doc_id"""),
    // r12: the round's flagship new family — benched so the paragraph
    // pass gets a cross-round perf trace from day one (the same gap the
    // r11 verdict flagged for the multimodal decode path)
    bench = true)

  /** Gopher-rules composite filter ([[Text.gopherRules]], Rae et al.
    * 2021 Table A1 defaults): per-doc raw signals, per-rule booleans,
    * composite pass, and the comma-joined fail_reasons string. The
    * gopher bait (three non-alphabetic tokens, four symbol matches)
    * rides doc_id % 13 so the symbol and alpha rules fire on short
    * baited docs and pass on long ones; the word-count (50) and
    * stopword (≥2) rules split the raw corpus on their own. Hash-exact:
    * integer signals, one exact int/int double division per ratio.
    */
  val xQualityGopherRules = Q(
    "x_quality_gopher_rules",
    (s, dir) => {
      val injected = t(s, dir, "documents")
        .select(col("doc_id"), concat(col("text"), gopherBait).as("text"))
      Text.gopherRules(injected, "text", "doc_id").orderBy(col("doc_id"))
    },
    Some(s"""WITH inj AS (SELECT doc_id, text || $gopherBaitSql AS t
        FROM documents),
      $gopherCtesSql
      SELECT doc_id, n_words, mean_word_len, n_symbols, n_alpha_words,
        n_stopwords, r_words, r_wordlen, r_symbol, r_alpha, r_stop, pass,
        concat_ws(',',
          CASE WHEN NOT r_words THEN 'words' END,
          CASE WHEN NOT r_wordlen THEN 'wordlen' END,
          CASE WHEN NOT r_symbol THEN 'symbol' END,
          CASE WHEN NOT r_alpha THEN 'alpha' END,
          CASE WHEN NOT r_stop THEN 'stop' END) AS fail_reasons
      FROM gr ORDER BY doc_id"""))

  /** Quality-funnel capstone: the attrition report every curation run
    * opens with — encoding-garbage screen → Gopher rules → CCNet
    * fluency cut, sequentially AND-composed. The raw-bytes filters
    * (encoding, gopher) see the garbage-injected text; the LM scores
    * the CLEAN text (real pipelines strip garbage before perplexity
    * scoring), riding the SAME bigram-LM replay as the fluency/bucket
    * oracles via the shared CTE block. One hash-exact row: stage
    * counts + final survival fraction.
    */
  val xPipelineQualityFunnel = Q(
    "x_pipeline_quality_funnel",
    (s, dir) => {
      val docs = t(s, dir, "documents")
      val injected = docs.select(col("doc_id"),
        concat(col("text"), encGarbage, gopherBait).as("text"))
      val enc = Text.encodingQuality(injected, "text", "doc_id")
        .select(col("doc_id"), col("is_clean"))
      val gph = Text.gopherRules(injected, "text", "doc_id")
        .select(col("doc_id"), col("pass"))
      val ppl = Text.perplexityBuckets(docs, "text", "doc_id", nBuckets = 3)
        .select(col("doc_id"), col("bucket"))
      enc.join(gph, "doc_id").join(ppl, Seq("doc_id"), "left")
        .agg(
          count(lit(1)).cast("bigint").as("n_all"),
          sum(when(col("is_clean"), 1).otherwise(0)).cast("bigint")
            .as("n_encoding_clean"),
          sum(when(col("is_clean") && col("pass"), 1).otherwise(0))
            .cast("bigint").as("n_gopher_pass"),
          sum(when(col("is_clean") && col("pass") && col("bucket") < 2, 1)
            .otherwise(0)).cast("bigint").as("n_fluent"))
        .withColumn("survival_frac",
          col("n_fluent").cast("double") / col("n_all").cast("double"))
    },
    Some(s"""${Ext.bigramLmCtes},
      ${Ext.rankBucketCtes},
      inj AS (SELECT doc_id, text || $encGarbageSql
          || $gopherBaitSql AS t
        FROM documents),
      enc AS (SELECT doc_id,
          ((length(t) - length(replace(t, chr(65533), ''))) = 0 AND
           (length(t) - length(regexp_replace(t,
             '[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]', '', 'g'))) = 0 AND
           (length(t) - length(regexp_replace(t,
             '[\\x80-\\x9F]', '', 'g'))) = 0) AS is_clean
        FROM inj),
      $gopherCtesSql,
      fl AS (SELECT e.doc_id, e.is_clean, g.pass, bk.bucket
        FROM enc e JOIN gr g USING (doc_id) LEFT JOIN bk USING (doc_id))
      SELECT CAST(COUNT(*) AS BIGINT) AS n_all,
        CAST(SUM(CASE WHEN is_clean THEN 1 ELSE 0 END) AS BIGINT)
          AS n_encoding_clean,
        CAST(SUM(CASE WHEN is_clean AND pass THEN 1 ELSE 0 END) AS BIGINT)
          AS n_gopher_pass,
        CAST(SUM(CASE WHEN is_clean AND pass AND bucket < 2 THEN 1 ELSE 0 END)
          AS BIGINT) AS n_fluent,
        CAST(SUM(CASE WHEN is_clean AND pass AND bucket < 2 THEN 1 ELSE 0 END)
          AS DOUBLE) / COUNT(*) AS survival_frac
      FROM fl"""))

  val queries: Seq[Q] = Seq(xTextCompressionRatio, xTextEncodingQuality,
    xPipelineParagraphDedup, xQualityGopherRules, xPipelineQualityFunnel)
}
