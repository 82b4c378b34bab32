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
      val g = concat(
        when(col("doc_id") % 7 === 0,
          expr("repeat('\uFFFD', cast(doc_id % 4 + 1 as int))"))
          .otherwise(lit("")),
        when(col("doc_id") % 5 === 0, lit("\u0007\u0001\u007F"))
          .otherwise(lit("")),
        when(col("doc_id") % 11 === 0, lit("\u0085\u0096"))
          .otherwise(lit("")))
      val injected = t(s, dir, "documents")
        .select(col("doc_id"), concat(col("text"), g).as("text"))
      Text.encodingQuality(injected, "text", "doc_id").orderBy(col("doc_id"))
    },
    Some("""WITH inj AS (SELECT doc_id, text ||
        CASE WHEN doc_id % 7 = 0
          THEN repeat(chr(65533), CAST(doc_id % 4 + 1 AS INT)) ELSE '' END ||
        CASE WHEN doc_id % 5 = 0
          THEN chr(7) || chr(1) || chr(127) ELSE '' END ||
        CASE WHEN doc_id % 11 = 0
          THEN chr(133) || chr(150) ELSE '' END AS t
      FROM documents),
      m AS (SELECT doc_id, CAST(length(t) AS BIGINT) AS n_chars,
        CAST(length(t) - length(replace(t, chr(65533), '')) AS BIGINT)
          AS n_replacement,
        CAST(length(t) - length(regexp_replace(t,
          '[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]', '', 'g')) AS BIGINT)
          AS n_control,
        CAST(length(t) - length(regexp_replace(t,
          '[\x80-\x9F]', '', 'g')) AS BIGINT) AS n_c1
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

  /** Dolma-style paragraph-level near-dup capstone
    * ([[Dedup.paragraphDedup]]): 20-token segments, paragraph-keyed
    * MinHash+LSH at j ≥ 0.8, earlier-occurrence-wins removal, per-doc
    * damage report with the re-assembled text adjudicated
    * byte-for-byte. The oracle replays the CHAIN — segmentation, the
    * ordered pid key, the exhaustive exact-Jaccard pair set (LSH must
    * find every true pair: P(miss) ≤ 4.7e-8 each at 128 hashes / 32
    * bands), removal, and ordered re-assembly. Multi-referenced CTEs
    * are MATERIALIZED (sh self-joins; DuckDB re-inlines plain CTEs per
    * reference).
    */
  val xPipelineParagraphDedup = Q(
    "x_pipeline_paragraph_dedup",
    (s, dir) => Dedup.paragraphDedup(t(s, dir, "documents"), "text", "doc_id",
      paraTokens = 20, minTokens = 5, threshold = 0.8)
      .orderBy(col("doc_id")),
    Some("""WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks
        FROM documents),
      ch AS MATERIALIZED (SELECT doc_id,
          generate_subscripts(range(0, greatest(len(toks), 1), 20), 1) - 1
            AS chunk_idx,
          unnest(range(0, greatest(len(toks), 1), 20)) AS start, toks
        FROM d),
      cx AS MATERIALIZED (SELECT doc_id, chunk_idx,
          array_to_string(toks[start + 1 : start + 20], ' ') AS chunk_text,
          least(len(toks) - start, 20) AS n_toks
        FROM ch),
      pw AS MATERIALIZED (SELECT doc_id * 1000000 + chunk_idx AS pid,
          string_split(chunk_text, ' ') AS w
        FROM cx WHERE n_toks >= 5),
      sh AS MATERIALIZED (SELECT DISTINCT pid,
          unnest(list_transform(range(1, len(w) - 1),
            i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
        FROM pw),
      cnt AS MATERIALIZED (SELECT pid, count(*) AS n FROM sh GROUP BY pid),
      inter AS (SELECT a.pid AS pa, b.pid AS pb, count(*) AS ix
        FROM sh a JOIN sh b ON a.s = b.s AND a.pid < b.pid GROUP BY pa, pb),
      rm AS MATERIALIZED (SELECT DISTINCT pb AS pid FROM inter
        JOIN cnt ca ON ca.pid = pa JOIN cnt cb ON cb.pid = pb
        WHERE CAST(ix AS DOUBLE) / (ca.n + cb.n - ix) >= 0.8),
      rep AS (SELECT cx.doc_id, cx.chunk_idx, cx.chunk_text,
          CASE WHEN rm.pid IS NOT NULL THEN 1 ELSE 0 END AS removed
        FROM cx LEFT JOIN rm
          ON cx.doc_id * 1000000 + cx.chunk_idx = rm.pid)
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_paragraphs,
        CAST(SUM(removed) AS BIGINT) AS n_removed,
        COALESCE(string_agg(CASE WHEN removed = 0 THEN chunk_text END, ' '
          ORDER BY chunk_idx), '') AS deduped_text,
        CAST(SUM(removed) AS DOUBLE) / COUNT(*) AS dup_frac
      FROM rep GROUP BY doc_id ORDER BY doc_id"""))

  val queries: Seq[Q] = Seq(xTextCompressionRatio, xTextEncodingQuality,
    xPipelineParagraphDedup)
}
