package graft.queries

import org.apache.spark.sql.functions._
import graft.ext._
import H.t

/** Round-13 operators: checksum-validated PII (Luhn cards + IBAN
  * mod-97), line-level quality rules and newline paragraph dedup over
  * deterministically injected newline structure, the Naive-Bayes
  * model-quality filter, and the unigram-LM tokenizer pair.
  */
object ExtJ {

  /** doc_id-keyed PII bait shared by the engine and oracle halves of
    * x_text_pii2 (the encGarbage injection discipline): Luhn-valid and
    * Luhn-INVALID 16-digit candidates (public test numbers), a 20-digit
    * run that must NOT match the word-bounded 16-digit pattern, and
    * mod-97-valid/-invalid IBANs across three digit-BBAN countries.
    * Every constant was verified against an independent Python
    * implementation of both checksums.
    */
  private def piiBait = concat(
    when(col("doc_id") % 7 === 0, lit(" 4111111111111111"))
      .when(col("doc_id") % 7 === 3, lit(" 4111111111111112"))
      .otherwise(lit("")),
    when(col("doc_id") % 11 === 0, lit(" 1234567890123456"))
      .otherwise(lit("")),
    when(col("doc_id") % 13 === 0, lit(" 41111111111111112222"))
      .otherwise(lit("")),
    when(col("doc_id") % 5 === 0, lit(" DE89370400440532013000"))
      .when(col("doc_id") % 5 === 2, lit(" DE89370400440532013001"))
      .otherwise(lit("")),
    when(col("doc_id") % 17 === 0, lit(" AT611904300234573201"))
      .otherwise(lit("")),
    when(col("doc_id") % 19 === 0, lit(" PL61109010140000071219812874"))
      .otherwise(lit("")))
  private val piiBaitSql = """
        CASE WHEN doc_id % 7 = 0 THEN ' 4111111111111111'
          WHEN doc_id % 7 = 3 THEN ' 4111111111111112' ELSE '' END ||
        CASE WHEN doc_id % 11 = 0 THEN ' 1234567890123456' ELSE '' END ||
        CASE WHEN doc_id % 13 = 0 THEN ' 41111111111111112222' ELSE '' END ||
        CASE WHEN doc_id % 5 = 0 THEN ' DE89370400440532013000'
          WHEN doc_id % 5 = 2 THEN ' DE89370400440532013001' ELSE '' END ||
        CASE WHEN doc_id % 17 = 0 THEN ' AT611904300234573201' ELSE '' END ||
        CASE WHEN doc_id % 19 = 0 THEN ' PL61109010140000071219812874'
          ELSE '' END"""

  /** Checksum-validated PII ([[Text.piiChecksums]]): Luhn mod-10 on
    * word-bounded 16-digit card candidates, ISO 13616 mod-97 on
    * digit-BBAN IBAN candidates, plus validated-only redaction. The
    * bait plants deliberately Luhn-invalid and mod-97-invalid
    * candidates so the oracle adjudicates BOTH directions — a
    * regex-only pass would flag (and mangle) them; the checksum pass
    * must count them as candidates but leave them untouched in
    * `redacted_text`. Hash-exact: integer checksum arithmetic, counts,
    * and byte-for-byte redacted text.
    */
  val xTextPii2 = Q(
    "x_text_pii2",
    (s, dir) => {
      val injected = t(s, dir, "documents")
        .select(col("doc_id"), concat(col("text"), piiBait).as("text"))
      Text.piiChecksums(injected, "text", "doc_id").orderBy(col("doc_id"))
    },
    Some(s"""WITH inj AS (SELECT doc_id, text || $piiBaitSql AS t
        FROM documents),
      c AS (SELECT doc_id, t,
        regexp_extract_all(t, '\\b[0-9]{16}\\b') AS cards,
        regexp_extract_all(t, '\\b[A-Z]{2}[0-9]{13,32}\\b') AS ibans
      FROM inj),
      v AS (SELECT doc_id, t, cards, ibans,
        list_filter(cards, cd -> list_sum(list_transform(range(1, 17),
          i -> CASE WHEN i % 2 = 1
            THEN 2 * (ascii(substr(cd, CAST(i AS INT), 1)) - 48)
              - CASE WHEN ascii(substr(cd, CAST(i AS INT), 1)) - 48 > 4
                THEN 9 ELSE 0 END
            ELSE ascii(substr(cd, CAST(i AS INT), 1)) - 48 END)) % 10 = 0)
          AS vcards,
        list_filter(ibans, ib -> list_reduce(list_prepend(CAST(0 AS BIGINT),
            list_concat(
              list_transform(range(5, length(ib) + 1),
                i -> CAST(ascii(substr(ib, CAST(i AS INT), 1)) - 48 AS BIGINT)),
              [CAST((ascii(substr(ib, 1, 1)) - 55) // 10 AS BIGINT),
               CAST((ascii(substr(ib, 1, 1)) - 55) % 10 AS BIGINT),
               CAST((ascii(substr(ib, 2, 1)) - 55) // 10 AS BIGINT),
               CAST((ascii(substr(ib, 2, 1)) - 55) % 10 AS BIGINT),
               CAST(ascii(substr(ib, 3, 1)) - 48 AS BIGINT),
               CAST(ascii(substr(ib, 4, 1)) - 48 AS BIGINT)])),
          (acc, d) -> (acc * 10 + d) % 97) = 1) AS vibans
      FROM c)
      SELECT doc_id,
        CAST(len(cards) AS BIGINT) AS n_card_candidates,
        CAST(len(vcards) AS BIGINT) AS n_card_valid,
        CAST(len(ibans) AS BIGINT) AS n_iban_candidates,
        CAST(len(vibans) AS BIGINT) AS n_iban_valid,
        (len(vcards) > 0 OR len(vibans) > 0) AS has_valid_pii,
        list_reduce(list_prepend(
            list_reduce(list_prepend(t, vcards),
              (acc, x) -> regexp_replace(acc, '\\b' || x || '\\b',
                '<PAN>', 'g')),
            vibans),
          (acc, x) -> regexp_replace(acc, '\\b' || x || '\\b',
            '<IBAN>', 'g')) AS redacted_text
      FROM v ORDER BY doc_id"""))

  /** Deterministic newline injection shared by the line-level queries
    * (the corpus carries no newlines — SURVEY/r12 scaladocs document
    * the line rules as untestable without it): each document is
    * rebuilt with a newline after every 12th token — the SAME
    * range-indexed construction on both engines, so the injected text
    * is byte-identical. Output column: `nl`.
    */
  private def withNewlines(df: org.apache.spark.sql.DataFrame) =
    df.select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(col("doc_id"),
        array_join(transform(sequence(lit(1), size(col("w"))), i =>
          concat(element_at(col("w"), i),
            when(i === size(col("w")), lit(""))
              .when(i % 12 === 0, lit("\n"))
              .otherwise(lit(" ")))), "").as("nl"))
  private val nlCtesSql = """
      sp AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      nl AS (SELECT doc_id, array_to_string(list_transform(
          range(1, len(w) + 1),
          i -> w[i] || CASE WHEN i = len(w) THEN ''
            WHEN i % 12 = 0 THEN chr(10) ELSE ' ' END), '') AS nlt
        FROM sp)"""

  /** Gopher's line-level rules ([[Text.gopherLineRules]]) on the
    * newline-injected corpus at the paper's own thresholds: docs
    * doc_id%23==0 are prefixed with 150 bullet lines (bullet_frac
    * ≈ 0.95 on typical docs — over the 0.9 cut unless the doc itself
    * is long), docs doc_id%21==0 gain three trailing ellipsis lines
    * (≈ 0.375 > 0.3 on short docs); everyone else adjudicates the
    * false-positive direction. Hash-exact: line counts + one int/int
    * division per fraction.
    */
  val xQualityGopherLines = Q(
    "x_quality_gopher_lines",
    (s, dir) => {
      val injected = withNewlines(t(s, dir, "documents"))
        .select(col("doc_id"), concat(
          when(col("doc_id") % 23 === 0, repeat(lit("- item\n"), 150))
            .otherwise(lit("")),
          col("nl"),
          when(col("doc_id") % 21 === 0,
            repeat(lit("\nto be continued..."), 3)).otherwise(lit("")))
          .as("text"))
      Text.gopherLineRules(injected, "text", "doc_id").orderBy(col("doc_id"))
    },
    Some(s"""WITH $nlCtesSql,
      inj AS (SELECT doc_id,
        CASE WHEN doc_id % 23 = 0
          THEN repeat('- item' || chr(10), 150) ELSE '' END || nlt ||
        CASE WHEN doc_id % 21 = 0
          THEN repeat(chr(10) || 'to be continued...', 3) ELSE '' END AS t
        FROM nl),
      ln AS (SELECT doc_id, string_split(t, chr(10)) AS ls FROM inj),
      sig AS (SELECT doc_id, CAST(len(ls) AS BIGINT) AS n_lines,
        CAST(len(list_filter(ls, l -> l LIKE '- %' OR l LIKE '* %'))
          AS BIGINT) AS n_bullet_lines,
        CAST(len(list_filter(ls, l -> l LIKE '%...')) AS BIGINT)
          AS n_ellipsis_lines
        FROM ln)
      SELECT doc_id, n_lines, n_bullet_lines, n_ellipsis_lines,
        CAST(n_bullet_lines AS DOUBLE) / n_lines AS bullet_frac,
        CAST(n_ellipsis_lines AS DOUBLE) / n_lines AS ellipsis_frac,
        (CAST(n_bullet_lines AS DOUBLE) / n_lines <= 0.9) AS r_bullet,
        (CAST(n_ellipsis_lines AS DOUBLE) / n_lines <= 0.3) AS r_ellipsis,
        (CAST(n_bullet_lines AS DOUBLE) / n_lines <= 0.9 AND
         CAST(n_ellipsis_lines AS DOUBLE) / n_lines <= 0.3) AS pass
      FROM sig ORDER BY doc_id"""))

  // CCNet-style boilerplate paragraphs: 22 tokens → 20 3-gram
  // shingles; the variant changes ONLY the last token, so the rep pair
  // sits at j = 19/21 ≈ 0.905 ≥ 0.8 — a true NEAR-dup (not exact)
  private val cookie = "this website uses cookies to improve your " +
    "browsing experience and by continuing to browse this site you " +
    "agree to our cookie policy"
  private val cookieVar = cookie.stripSuffix("policy") + "terms"

  /** Paragraph dedup on REAL newline paragraphs
    * ([[Dedup.paragraphDedupLines]]): the newline-injected corpus plus
    * a planted boilerplate line — docs doc_id%6==0 share an exact
    * cookie-banner line, docs doc_id%6==3 its one-token near-variant
    * (j ≈ 0.905) — so the earliest occurrence (doc 0) keeps its banner
    * and every other copy/variant is removed, exactly the CCNet
    * line-dedup behavior. The oracle replays the chain — newline
    * segmentation, ordered pid keys, exhaustive exact-Jaccard pairs,
    * removal, newline re-assembly — byte-for-byte (the r12 fixed-window
    * oracle with `split(t, chr(10))` segmentation).
    */
  val xDedupParagraphNewline = Q(
    "x_dedup_paragraph_newline",
    (s, dir) => {
      val injected = withNewlines(t(s, dir, "documents"))
        .select(col("doc_id"), concat(col("nl"),
          when(col("doc_id") % 6 === 0, lit("\n" + cookie))
            .when(col("doc_id") % 6 === 3, lit("\n" + cookieVar))
            .otherwise(lit(""))).as("text"))
      Dedup.paragraphDedupLines(injected, "text", "doc_id",
        minTokens = 5, threshold = 0.8, eager = false).orderBy(col("doc_id"))
    },
    Some(s"""WITH $nlCtesSql,
      inj AS (SELECT doc_id, nlt ||
        CASE WHEN doc_id % 6 = 0 THEN chr(10) || '$cookie'
          WHEN doc_id % 6 = 3 THEN chr(10) || '$cookieVar'
          ELSE '' END AS t
        FROM nl),
      ch AS MATERIALIZED (SELECT doc_id,
          generate_subscripts(string_split(t, chr(10)), 1) - 1 AS chunk_idx,
          unnest(string_split(t, chr(10))) AS chunk_text
        FROM inj),
      cx AS MATERIALIZED (SELECT doc_id, chunk_idx, chunk_text,
          len(string_split(chunk_text, ' ')) AS n_toks
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
        COALESCE(string_agg(CASE WHEN removed = 0 THEN chunk_text END,
          chr(10) ORDER BY chunk_idx), '') AS deduped_text,
        CAST(SUM(removed) AS DOUBLE) / COUNT(*) AS dup_frac
      FROM rep GROUP BY doc_id ORDER BY doc_id"""))

  /** Shared label + NB-training CTE chain for the model-filter pair:
    * Gopher-rules pass on the RAW corpus as the corpus-derived label
    * (264/236 at sf0.01 — driven by the word-count and stopword rules),
    * then the add-1-smoothed token model. Engine and oracle derive the
    * model from the SAME counts; every ln is DECIMAL(20,12)-canonical.
    */
  private val nbCtesSql = s"""inj AS (SELECT doc_id, text AS t FROM documents),
      ${ExtI.gopherCtesSql},
      lab AS (SELECT doc_id, pass AS label FROM gr),
      tk AS (SELECT d.doc_id, token, label FROM
          (SELECT doc_id, unnest(string_split(text, ' ')) AS token
           FROM documents) d
        JOIN lab USING (doc_id) WHERE length(token) > 0),
      cnts AS (SELECT token,
          CAST(SUM(CASE WHEN label THEN 1 ELSE 0 END) AS BIGINT) AS cnt_pos,
          CAST(SUM(CASE WHEN label THEN 0 ELSE 1 END) AS BIGINT) AS cnt_neg
        FROM tk GROUP BY token),
      tot AS (SELECT CAST(SUM(cnt_pos) AS BIGINT) AS n_pos,
          CAST(SUM(cnt_neg) AS BIGINT) AS n_neg,
          CAST(COUNT(*) AS BIGINT) AS v FROM cnts),
      model AS (SELECT token, cnt_pos, cnt_neg,
          CAST(CAST(ln(CAST(cnt_pos + 1 AS DOUBLE) /
            CAST(n_pos + v AS DOUBLE)) AS DECIMAL(20,12)) AS DOUBLE) AS lp_pos,
          CAST(CAST(ln(CAST(cnt_neg + 1 AS DOUBLE) /
            CAST(n_neg + v AS DOUBLE)) AS DECIMAL(20,12)) AS DOUBLE) AS lp_neg
        FROM cnts, tot)"""

  /** NB model table ([[Model.naiveBayesModel]]): per-token class
    * counts, smoothed log-likelihoods, and the log-likelihood ratio.
    * The oracle re-derives the MODEL itself from the label CTEs (the
    * bpeTrain discipline) — training is adjudicated, not just applied.
    */
  val xQualityModelTrain = Q(
    "x_quality_model_train",
    (s, dir) => {
      val docs = t(s, dir, "documents")
      val labeled = docs.join(
        Text.gopherRules(docs, "text", "doc_id")
          .select(col("doc_id"), col("pass").as("label")), "doc_id")
      Model.naiveBayesModel(labeled, "text", "doc_id", "label")
        .orderBy(col("token"))
    },
    Some(s"""WITH $nbCtesSql
      SELECT token, cnt_pos, cnt_neg, lp_pos, lp_neg,
        lp_pos - lp_neg AS llr
      FROM model ORDER BY token"""))

  /** Model-based quality filter ([[Model.naiveBayesFilter]]): every
    * document scored under both classes (log prior + Σ tf·lp, decimal-
    * summed), the argmax verdict, the training label, and agreement.
    * Hash-exact end-to-end: the oracle replays training AND scoring
    * from the same counts, so a single perturbed count anywhere in the
    * chain flips the hash.
    */
  val xQualityModelFilter = Q(
    "x_quality_model_filter",
    (s, dir) => {
      val docs = t(s, dir, "documents")
      val labeled = docs.join(
        Text.gopherRules(docs, "text", "doc_id")
          .select(col("doc_id"), col("pass").as("label")), "doc_id")
      Model.naiveBayesFilter(labeled, "text", "doc_id", "label")
        .orderBy(col("doc_id"))
    },
    Some(s"""WITH $nbCtesSql,
      tf AS (SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
        FROM tk GROUP BY doc_id, token),
      sums AS (SELECT doc_id,
          CAST(SUM(tf) AS BIGINT) AS n_tokens,
          CAST(SUM(CAST(CAST(tf AS DOUBLE) * lp_pos AS DECIMAL(30,14)))
            AS DOUBLE) AS s_pos,
          CAST(SUM(CAST(CAST(tf AS DOUBLE) * lp_neg AS DECIMAL(30,14)))
            AS DOUBLE) AS s_neg
        FROM tf JOIN model USING (token) GROUP BY doc_id),
      pri AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
          CAST(SUM(CASE WHEN label THEN 1 ELSE 0 END) AS BIGINT)
            AS n_pos_docs FROM lab),
      pr AS (SELECT
          CAST(CAST(ln(CAST(n_pos_docs AS DOUBLE) / CAST(n_docs AS DOUBLE))
            AS DECIMAL(20,12)) AS DOUBLE) AS lprior_pos,
          CAST(CAST(ln(CAST(n_docs - n_pos_docs AS DOUBLE) /
            CAST(n_docs AS DOUBLE)) AS DECIMAL(20,12)) AS DOUBLE)
            AS lprior_neg FROM pri),
      sc AS (SELECT l.doc_id, COALESCE(n_tokens, 0) AS n_tokens,
          COALESCE(s_pos, 0.0) + lprior_pos AS score_pos,
          COALESCE(s_neg, 0.0) + lprior_neg AS score_neg,
          label
        FROM lab l LEFT JOIN sums USING (doc_id), pr)
      SELECT doc_id, n_tokens, score_pos, score_neg, label,
        (score_pos > score_neg) AS predicted,
        ((score_pos > score_neg) = label) AS correct
      FROM sc ORDER BY doc_id"""),
    // r15: benched (r13 ask #9) — the NB train+score chain gets a
    // cross-round perf trace
    bench = true)

  /** Unigram-LM tokenizer training ([[Unigram.train]]): the final
    * model table after 2 hard-EM rounds over the word-frequency table
    * — piece, final-round Viterbi count, smoothed canonical log-prob.
    * The oracle unrolls BOTH rounds — seed substring counts, each DP
    * cell, the backpointer walk, the weighted re-count, the smoothing
    * — from the same constants (maxPiece=4, maxN=12).
    */
  val xUnigramTrain = Q(
    "x_unigram_train",
    (s, dir) => Unigram.train(t(s, dir, "documents"), "text",
      maxPiece = 4, maxN = 12, rounds = 2).orderBy(col("piece")),
    Some(Unigram.trainSql(maxPiece = 4, maxN = 12, rounds = 2)),
    // r15: benched (r13 ask #9) — the hard-EM tokenizer training gets
    // a cross-round perf trace
    bench = true)

  /** Unigram-LM encoding ([[Unigram.encode]]): Viterbi segmentation of
    * every corpus word under the trained model, rolled up per document
    * — token/char/piece counts and chars-per-piece fertility. The
    * oracle re-derives the model itself and replays the encode pass.
    */
  val xUnigramEncode = Q(
    "x_unigram_encode",
    (s, dir) => Unigram.encode(t(s, dir, "documents"), "text", "doc_id",
      maxPiece = 4, maxN = 12, rounds = 2).orderBy(col("doc_id")),
    Some(Unigram.encodeSql(maxPiece = 4, maxN = 12, rounds = 2)))

  val queries: Seq[Q] = Seq(xTextPii2, xQualityGopherLines,
    xDedupParagraphNewline, xQualityModelTrain, xQualityModelFilter,
    xUnigramTrain, xUnigramEncode)
}
