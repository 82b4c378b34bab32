package graft.queries

import org.apache.spark.sql.functions._
import graft.ext.{Sampling, Text}
import graft.queries.H.t

/** Training-data curation operators (SURVEY.md §2.8, second wave):
  * repetition-based quality signals, PII redaction, benchmark
  * decontamination, and deterministic mixture resampling — the
  * corpus-hygiene steps a pretraining pipeline runs between ingest and
  * tokenization. Every query is oracle-adjudicable: the signals are
  * exact integer counts and single IEEE divisions, and selection is
  * keyed on the SQL-replayable rolling fingerprint rather than RNG.
  */
object Curate {

  /** Gopher-style repetition signals over word bigrams. */
  val xTextRepetition = Q(
    "x_text_repetition",
    (s, dir) => Text.repetitionSignals(t(s, dir, "documents"), "text", "doc_id")
      .orderBy(col("doc_id")),
    Some("""WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      g AS (SELECT doc_id,
        unnest(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])) AS gram
        FROM d),
      c AS (SELECT doc_id, gram, count(*) AS c FROM g GROUP BY 1, 2),
      a AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_grams,
        CAST(COUNT(*) AS BIGINT) AS distinct_grams,
        CAST(MAX(c) AS BIGINT) AS top_count
        FROM c GROUP BY 1)
      SELECT doc_id, n_grams, distinct_grams, top_count,
        CAST(top_count AS DOUBLE) / CAST(n_grams AS DOUBLE) AS top_gram_frac,
        1.0 - CAST(distinct_grams AS DOUBLE) / CAST(n_grams AS DOUBLE) AS dup_gram_frac
      FROM a ORDER BY doc_id"""))

  /** PII detection + redaction. The corpus table carries no PII, so the
    * input is a contact string synthesized DETERMINISTICALLY from the
    * customer table with identical expressions on both sides — the
    * operator under test is the regex detect/redact chain, which runs
    * on the Spark side only and must survive the oracle's independent
    * RE2 replay. Phone present iff custkey % 3 != 0 and email iff
    * custkey % 2 == 0, so zero/one/many-match cases are all exercised.
    */
  val xPiiRedact = Q(
    "x_pii_redact",
    (s, dir) => {
      val phone = concat(lit("call 555-"),
        lpad((col("c_custkey") * 7 % 1000).cast("string"), 3, "0"), lit("-"),
        lpad((col("c_custkey") * 13 % 10000).cast("string"), 4, "0"), lit(" "))
      val email = concat(lit("mail "),
        lower(regexp_replace(col("c_name"), "#", ".")), lit("@example.com "))
      val ip = concat(lit("host 10."), (col("c_nationkey") % 256).cast("string"),
        lit("."), (col("c_custkey") % 256).cast("string"), lit(".7 "))
      val contact = concat(col("c_name"), lit(" "),
        when(col("c_custkey") % 3 =!= 0, phone).otherwise(lit("")),
        when(col("c_custkey") % 2 === 0, email).otherwise(lit("")),
        ip, col("c_mktsegment"))
      t(s, dir, "customer").filter(col("c_custkey") < 500)
        .select(col("c_custkey"), contact.as("contact"))
        .select(col("c_custkey"),
          Text.piiEmailCount(col("contact")).cast("int").as("n_emails"),
          Text.piiPhoneCount(col("contact")).cast("int").as("n_phones"),
          Text.piiIpv4Count(col("contact")).cast("int").as("n_ips"),
          Text.redactPii(col("contact")).as("redacted"))
        .orderBy(col("c_custkey"))
    },
    Some("""WITH b AS (SELECT c_custkey, c_name || ' ' ||
        CASE WHEN c_custkey % 3 <> 0 THEN 'call 555-' ||
          lpad(CAST(c_custkey * 7 % 1000 AS VARCHAR), 3, '0') || '-' ||
          lpad(CAST(c_custkey * 13 % 10000 AS VARCHAR), 4, '0') || ' '
          ELSE '' END ||
        CASE WHEN c_custkey % 2 = 0 THEN 'mail ' ||
          lower(regexp_replace(c_name, '#', '.')) || '@example.com '
          ELSE '' END ||
        'host 10.' || CAST(c_nationkey % 256 AS VARCHAR) || '.' ||
        CAST(c_custkey % 256 AS VARCHAR) || '.7 ' || c_mktsegment AS contact
        FROM customer WHERE c_custkey < 500)
      SELECT c_custkey,
        CAST(len(regexp_extract_all(contact,
          '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}')) AS INTEGER) AS n_emails,
        CAST(len(regexp_extract_all(contact,
          '[0-9]{3}-[0-9]{3}-[0-9]{4}')) AS INTEGER) AS n_phones,
        CAST(len(regexp_extract_all(contact,
          '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}')) AS INTEGER) AS n_ips,
        regexp_replace(regexp_replace(regexp_replace(contact,
          '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}', '<EMAIL>', 'g'),
          '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}', '<IP>', 'g'),
          '[0-9]{3}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g') AS redacted
      FROM b ORDER BY c_custkey"""))

  /** Benchmark decontamination: eval set = docs 0–19, corpus = the
    * rest; 5-gram overlap. The corpus contains near-duplicates of the
    * eval docs by construction of the test data, so nonzero hits are
    * exercised alongside clean docs.
    */
  val xDecontaminate = Q(
    "x_decontaminate",
    (s, dir) => {
      val docs = t(s, dir, "documents")
      Text.contamination(
        docs.filter(col("doc_id") >= 20),
        docs.filter(col("doc_id") < 20),
        "text", "doc_id", n = 5)
        .orderBy(col("doc_id"))
    },
    Some("""WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      g AS (SELECT DISTINCT doc_id,
        unnest(list_transform(range(1, len(w) - 3),
          i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4])) AS gram
        FROM d),
      eg AS (SELECT DISTINCT gram FROM g WHERE doc_id < 20),
      a AS (SELECT g.doc_id, count(*) AS n_grams, count(eg.gram) AS n_hit
        FROM g LEFT JOIN eg ON g.gram = eg.gram
        WHERE g.doc_id >= 20 GROUP BY 1)
      SELECT doc_id, CAST(n_grams AS BIGINT) AS n_grams,
        CAST(n_hit AS BIGINT) AS n_hit,
        CAST(n_hit AS DOUBLE) / CAST(n_grams AS DOUBLE) AS hit_frac,
        n_hit > 0 AS contaminated
      FROM a ORDER BY doc_id"""))

  /** Hashed-gram decontamination — the broadcast-shrinking scale path,
    * oracle-adjudicable because the gram hash is the SQL-replayable
    * rolling fingerprint. On this corpus it is collision-free, so the
    * result equals x_decontaminate row for row (also asserted in
    * CurateSpec).
    */
  val xDecontaminateHashed = Q(
    "x_decontaminate_hashed",
    (s, dir) => {
      val docs = t(s, dir, "documents")
      Text.contamination(
        docs.filter(col("doc_id") >= 20),
        docs.filter(col("doc_id") < 20),
        "text", "doc_id", n = 5, hashedGrams = true)
        .orderBy(col("doc_id"))
    },
    Some("""WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      g AS (SELECT DISTINCT doc_id,
        list_reduce(
          list_prepend(CAST(0 AS BIGINT),
            list_transform(w[i : i + 4],
              t -> CAST(len(t)*961 + ascii(t)*31 + ascii(t[-1]) AS BIGINT))),
          (a, x) -> (a*1000003 + x) % 2147483647) AS gram
        FROM (SELECT doc_id, w, unnest(range(1, len(w) - 3)) AS i FROM d)),
      eg AS (SELECT DISTINCT gram FROM g WHERE doc_id < 20),
      a AS (SELECT g.doc_id, count(*) AS n_grams, count(eg.gram) AS n_hit
        FROM g LEFT JOIN eg ON g.gram = eg.gram
        WHERE g.doc_id >= 20 GROUP BY 1)
      SELECT doc_id, CAST(n_grams AS BIGINT) AS n_grams,
        CAST(n_hit AS BIGINT) AS n_hit,
        CAST(n_hit AS DOUBLE) / CAST(n_grams AS DOUBLE) AS hit_frac,
        n_hit > 0 AS contaminated
      FROM a ORDER BY doc_id"""))

  /** Fuzzy decontamination: flag corpus docs that are NEAR-duplicates
    * of any eval doc (3-gram Jaccard ≥ 0.5) — catches the paraphrased
    * benchmark leakage exact n-gram overlap misses. Composed from the
    * verified MinHash+LSH pair machinery on the full table: a pair
    * (a < b) with a in the eval range and b in the corpus range is an
    * eval→corpus hit. LSH banding (128/32) detects every pair at this
    * threshold (x_dedup_minhash_lsh matches the exhaustive oracle
    * pair-for-pair) and verification is exact, so the oracle can be the
    * exhaustive eval×corpus Jaccard join.
    */
  val xDecontaminateFuzzy = Q(
    "x_decontaminate_fuzzy",
    (s, dir) => {
      import graft.ext.Dedup
      Dedup.minhashLshPairs(t(s, dir, "documents"), "text", "doc_id",
          k = 3, threshold = 0.5)
        .filter(col("doc_a") < 20 && col("doc_b") >= 20)
        .groupBy(col("doc_b").as("doc_id"))
        .agg(count(lit(1)).cast("bigint").as("n_eval_matches"),
          max(col("jaccard")).as("max_jaccard"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      sh AS (SELECT DISTINCT doc_id,
        unnest(list_transform(range(1, len(w)-1), i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
        FROM toks),
      cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
      inter AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS ix
        FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        WHERE a.doc_id < 20 AND b.doc_id >= 20 GROUP BY da, db),
      hits AS (SELECT da, db,
        CAST(ix AS DOUBLE)/(ca.n + cb.n - ix) AS jaccard
        FROM inter JOIN cnt ca ON ca.doc_id = da JOIN cnt cb ON cb.doc_id = db
        WHERE CAST(ix AS DOUBLE)/(ca.n + cb.n - ix) >= 0.5)
      SELECT db AS doc_id, CAST(COUNT(*) AS BIGINT) AS n_eval_matches,
        MAX(jaccard) AS max_jaccard
      FROM hits GROUP BY db ORDER BY doc_id"""))

  private val mixtureRates =
    Map("en" -> 200, "de" -> 800, "fr" -> 800, "es" -> 800, "zh" -> 1000)

  /** Deterministic mixture resampling: downweight the dominant language
    * to 20%, keep low-resource languages at 80–100%, selection keyed on
    * the content fingerprint (see [[graft.ext.Sampling]]). Summary is
    * per-language totals; ExtSpec asserts the filtered variant agrees.
    */
  val xSampleMixture = Q(
    "x_sample_mixture",
    (s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id"),
        Text.langId(col("text")).as("lang"),
        Text.fingerprint(col("text")).as("fp"))
      d.withColumn("kept",
          Sampling.mixtureKeep(col("fp"), col("lang"), mixtureRates))
        .groupBy(col("lang"))
        .agg(count(lit(1)).cast("bigint").as("n_docs"),
          sum(when(col("kept"), 1).otherwise(0)).cast("bigint").as("n_kept"))
        .withColumn("rate_per_mille",
          Sampling.mixtureRate(col("lang"), mixtureRates).cast("int"))
        .select(col("lang"), col("rate_per_mille"), col("n_docs"), col("n_kept"))
        .orderBy(col("lang"))
    },
    Some("""WITH sc AS (SELECT doc_id, text,
        len(regexp_extract_all(text, '[^\x00-\x7f]'))*10 + 5 AS s_zh,
        len(list_filter(string_split(text,' '), t -> list_contains(['the','a','of','and'], t)))*10 + 4 AS s_en,
        len(list_filter(string_split(text,' '), t -> list_contains(['der','die','das','und'], t)))*10 + 3 AS s_de,
        len(list_filter(string_split(text,' '), t -> list_contains(['le','la','les','et'], t)))*10 + 2 AS s_fr,
        len(list_filter(string_split(text,' '), t -> list_contains(['el','los','las','y'], t)))*10 + 1 AS s_es
        FROM documents),
      m AS (SELECT doc_id,
        CASE greatest(s_zh, s_en, s_de, s_fr, s_es) % 10
          WHEN 5 THEN 'zh' WHEN 4 THEN 'en' WHEN 3 THEN 'de' WHEN 2 THEN 'fr'
          ELSE 'es' END AS lang,
        list_reduce(
          list_prepend(CAST(0 AS BIGINT),
            list_transform(string_split(text, ' '),
              t -> CAST(len(t)*961 + ascii(t)*31 + ascii(t[-1]) AS BIGINT))),
          (a, x) -> (a*1000003 + x) % 2147483647) AS fp
        FROM sc),
      r AS (SELECT doc_id, lang, fp,
        CASE lang WHEN 'en' THEN 200 WHEN 'de' THEN 800 WHEN 'fr' THEN 800
          WHEN 'es' THEN 800 WHEN 'zh' THEN 1000 ELSE 1000 END AS rate
        FROM m)
      SELECT lang, CAST(max(rate) AS INTEGER) AS rate_per_mille,
        CAST(COUNT(*) AS BIGINT) AS n_docs,
        CAST(SUM(CASE WHEN fp % 1000 < rate THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
      FROM r GROUP BY lang ORDER BY lang"""))

  /** The full curation pipeline end-to-end, the shape a pretraining
    * corpus job runs nightly: per-doc quality signals → repetition
    * signal → decontamination verdict → deterministic mixture
    * resampling — ALL narrow, computed in one per-row pass — then
    * exact-dedup survivors → per-language corpus stats. The whole
    * composition runs in TWO shuffles (digest-keyed dedup, lang-keyed
    * stats; PlanSpec enforces the budget): repetition is the codegen'd
    * gram_stats expression and the decontamination probe tests each
    * row against the plan-embedded eval-gram set
    * ([[Text.contaminatedNarrow]]), so the corpus is never exploded,
    * shuffled, or joined for either signal. An earlier shape computed
    * repetition and contamination as separate DataFrames joined back
    * on doc_id — three more exchanges for identical output (~4.4s →
    * ~1.6s at sf0.1). Docs too short for grams score 0.0/clean,
    * matching the left-join + coalesce semantics of that shape.
    */
  val xPipelineCurate = Q(
    "x_pipeline_curate",
    (s, dir) => {
      val docs = t(s, dir, "documents")
      val evalSet = docs.filter(col("doc_id") < 20)
      val corpus = docs.filter(col("doc_id") >= 20)
      val evalGrams = Text.evalGramSet(evalSet, "text", n = 5)
      val kept = corpus.select(col("doc_id"), col("text"),
          Text.langId(col("text")).as("lang"),
          Text.wordCount(col("text")).as("n_words"),
          (Text.stopwordCount(col("text")).cast("double") /
            Text.wordCount(col("text"))).as("stop_ratio"),
          Text.fingerprint(col("text")).as("fp"),
          Text.topGramFrac(col("text")).as("top_gram_frac"),
          Text.contaminatedNarrow(col("text"), evalGrams, n = 5)
            .as("contaminated"))
        .filter(col("n_words") >= 20 &&
          col("stop_ratio") <= 0.5 &&
          col("top_gram_frac") <= 0.2 &&
          !col("contaminated") &&
          Sampling.mixtureKeep(col("fp"), col("lang"), mixtureRates))
      // digest-keyed exact dedup (Dedup.exactByDigest's shape): the
      // exchange ships 64 hex chars + three small values per row, never
      // the document body; groups are identical to text-keyed (the
      // oracle groups by text)
      val surv = kept
        .groupBy(sha2(col("text").cast("binary"), 256))
        .agg(min(col("doc_id")).as("doc_id"),
          max(col("lang")).as("lang"),
          max(col("n_words")).as("n_words"))
      surv.groupBy(col("lang"))
        .agg(count(lit(1)).cast("bigint").as("n_docs"),
          sum(col("n_words")).cast("bigint").as("total_tokens"))
        .orderBy(col("lang"))
    },
    Some("""WITH corpus AS (SELECT doc_id, text FROM documents WHERE doc_id >= 20),
      sc AS (SELECT doc_id, text,
        len(regexp_extract_all(text, '[^\x00-\x7f]'))*10 + 5 AS s_zh,
        len(list_filter(string_split(text,' '), t -> list_contains(['the','a','of','and'], t)))*10 + 4 AS s_en,
        len(list_filter(string_split(text,' '), t -> list_contains(['der','die','das','und'], t)))*10 + 3 AS s_de,
        len(list_filter(string_split(text,' '), t -> list_contains(['le','la','les','et'], t)))*10 + 2 AS s_fr,
        len(list_filter(string_split(text,' '), t -> list_contains(['el','los','las','y'], t)))*10 + 1 AS s_es
        FROM corpus),
      m AS (SELECT doc_id, text,
        CASE greatest(s_zh, s_en, s_de, s_fr, s_es) % 10
          WHEN 5 THEN 'zh' WHEN 4 THEN 'en' WHEN 3 THEN 'de' WHEN 2 THEN 'fr'
          ELSE 'es' END AS lang,
        CAST(len(string_split(text, ' ')) AS INTEGER) AS n_words,
        CAST(len(list_filter(string_split(text, ' '),
          t -> list_contains(['the','a','an','of','and','or','to','in','is','it'], t))) AS DOUBLE)
          / len(string_split(text, ' ')) AS stop_ratio,
        list_reduce(
          list_prepend(CAST(0 AS BIGINT),
            list_transform(string_split(text, ' '),
              t -> CAST(len(t)*961 + ascii(t)*31 + ascii(t[-1]) AS BIGINT))),
          (a, x) -> (a*1000003 + x) % 2147483647) AS fp
        FROM sc),
      big AS (SELECT doc_id,
        unnest(list_transform(range(1, len(string_split(text, ' '))),
          i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1])) AS gram
        FROM corpus),
      bc AS (SELECT doc_id, gram, count(*) AS c FROM big GROUP BY 1, 2),
      rep AS (SELECT doc_id,
        CAST(MAX(c) AS DOUBLE) / CAST(SUM(c) AS DOUBLE) AS top_gram_frac
        FROM bc GROUP BY 1),
      g5 AS (SELECT DISTINCT doc_id,
        unnest(list_transform(range(1, len(string_split(text, ' ')) - 3),
          i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1] || ' ' ||
            string_split(text, ' ')[i+2] || ' ' || string_split(text, ' ')[i+3] || ' ' ||
            string_split(text, ' ')[i+4])) AS gram
        FROM documents),
      eg AS (SELECT DISTINCT gram FROM g5 WHERE doc_id < 20),
      cont AS (SELECT g5.doc_id, count(eg.gram) > 0 AS contaminated
        FROM g5 LEFT JOIN eg ON g5.gram = eg.gram
        WHERE g5.doc_id >= 20 GROUP BY 1),
      kept AS (SELECT m.doc_id, m.text, m.lang, m.n_words FROM m
        LEFT JOIN rep ON rep.doc_id = m.doc_id
        LEFT JOIN cont ON cont.doc_id = m.doc_id
        WHERE m.n_words >= 20 AND m.stop_ratio <= 0.5
          AND coalesce(rep.top_gram_frac, 0.0) <= 0.2
          AND NOT coalesce(cont.contaminated, false)
          AND m.fp % 1000 < CASE m.lang WHEN 'en' THEN 200 WHEN 'de' THEN 800
            WHEN 'fr' THEN 800 WHEN 'es' THEN 800 WHEN 'zh' THEN 1000 ELSE 1000 END),
      surv AS (SELECT text, min(doc_id) AS doc_id, max(lang) AS lang,
        max(n_words) AS n_words FROM kept GROUP BY text)
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
        CAST(SUM(n_words) AS BIGINT) AS total_tokens
      FROM surv GROUP BY lang ORDER BY lang"""),
    bench = true)

  /** Per-language token budgeting: greedy doc_id-ordered prefix per
    * language until 3000 tokens — "take N tokens per domain" corpus
    * draws. Running sum is SQL-replayable, so fully oracle-checked.
    */
  val xSampleTokenBudget = Q(
    "x_sample_token_budget",
    (s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id"),
        Text.langId(col("text")).as("lang"),
        Text.wordCount(col("text")).as("n_words"))
      Sampling.tokenBudget(d, col("lang"), col("n_words"), col("doc_id"),
          budget = 3000L)
        .groupBy(col("lang"))
        .agg(count(lit(1)).cast("bigint").as("n_docs"),
          sum(col("n_words")).cast("bigint").as("tokens_kept"))
        .orderBy(col("lang"))
    },
    Some("""WITH sc AS (SELECT doc_id, text,
        len(regexp_extract_all(text, '[^\x00-\x7f]'))*10 + 5 AS s_zh,
        len(list_filter(string_split(text,' '), t -> list_contains(['the','a','of','and'], t)))*10 + 4 AS s_en,
        len(list_filter(string_split(text,' '), t -> list_contains(['der','die','das','und'], t)))*10 + 3 AS s_de,
        len(list_filter(string_split(text,' '), t -> list_contains(['le','la','les','et'], t)))*10 + 2 AS s_fr,
        len(list_filter(string_split(text,' '), t -> list_contains(['el','los','las','y'], t)))*10 + 1 AS s_es
        FROM documents),
      m AS (SELECT doc_id,
        CASE greatest(s_zh, s_en, s_de, s_fr, s_es) % 10
          WHEN 5 THEN 'zh' WHEN 4 THEN 'en' WHEN 3 THEN 'de' WHEN 2 THEN 'fr'
          ELSE 'es' END AS lang,
        CAST(len(string_split(text, ' ')) AS INTEGER) AS n_words
        FROM sc),
      c AS (SELECT doc_id, lang, n_words,
        SUM(n_words) OVER (PARTITION BY lang ORDER BY doc_id
          ROWS UNBOUNDED PRECEDING) AS cum
        FROM m)
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
        CAST(SUM(n_words) AS BIGINT) AS tokens_kept
      FROM c WHERE cum <= 3000 GROUP BY lang ORDER BY lang"""))

  /** Sequence packing summary per language: concat-and-chunk docs into
    * 512-token training sequences (see [[Sampling.packSequences]]),
    * report sequence counts, boundary-split docs, and packing
    * efficiency. Fully oracle-checked — the assignment is closed-form
    * arithmetic on the SQL-replayable running sum.
    */
  val xPackSequences = Q(
    "x_pack_sequences",
    (s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id"),
        Text.langId(col("text")).as("lang"),
        Text.wordCount(col("text")).as("n_words"))
      Sampling.packSequences(d, col("lang"), col("n_words"), col("doc_id"),
          seqLen = 512L)
        .groupBy(col("lang"))
        .agg(count(lit(1)).cast("bigint").as("n_docs"),
          sum(col("n_words")).cast("bigint").as("total_tokens"),
          (max(col("seq_last")) + 1).cast("bigint").as("n_seqs"),
          sum(when(col("n_splits") > 0, 1).otherwise(0)).cast("bigint")
            .as("n_split_docs"))
        .withColumn("pack_efficiency",
          col("total_tokens").cast("double") /
            (col("n_seqs") * 512L).cast("double"))
        .orderBy(col("lang"))
    },
    Some("""WITH sc AS (SELECT doc_id, text,
        len(regexp_extract_all(text, '[^\x00-\x7f]'))*10 + 5 AS s_zh,
        len(list_filter(string_split(text,' '), t -> list_contains(['the','a','of','and'], t)))*10 + 4 AS s_en,
        len(list_filter(string_split(text,' '), t -> list_contains(['der','die','das','und'], t)))*10 + 3 AS s_de,
        len(list_filter(string_split(text,' '), t -> list_contains(['le','la','les','et'], t)))*10 + 2 AS s_fr,
        len(list_filter(string_split(text,' '), t -> list_contains(['el','los','las','y'], t)))*10 + 1 AS s_es
        FROM documents),
      m AS (SELECT doc_id,
        CASE greatest(s_zh, s_en, s_de, s_fr, s_es) % 10
          WHEN 5 THEN 'zh' WHEN 4 THEN 'en' WHEN 3 THEN 'de' WHEN 2 THEN 'fr'
          ELSE 'es' END AS lang,
        CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words
        FROM sc),
      c AS (SELECT doc_id, lang, n_words,
        SUM(n_words) OVER (PARTITION BY lang ORDER BY doc_id
          ROWS UNBOUNDED PRECEDING) AS cum
        FROM m)
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
        CAST(SUM(n_words) AS BIGINT) AS total_tokens,
        CAST(MAX((cum - 1) // 512) + 1 AS BIGINT) AS n_seqs,
        CAST(SUM(CASE WHEN (cum - 1) // 512 > (cum - n_words) // 512
          THEN 1 ELSE 0 END) AS BIGINT) AS n_split_docs,
        CAST(SUM(n_words) AS DOUBLE) /
          CAST((MAX((cum - 1) // 512) + 1) * 512 AS DOUBLE) AS pack_efficiency
      FROM c GROUP BY lang ORDER BY lang"""))

  /** Temperature-scaled (α = 1/2) mixture weights per source domain
    * (see [[Sampling.temperatureWeights]]). The oracle recomputes
    * counts, sqrt terms, the decimal-rounded total, and the final
    * divisions — every weight is adjudicated bit-for-bit.
    */
  val xSampleTemperature = Q(
    "x_sample_temperature",
    (s, dir) => Sampling.temperatureWeights(
        t(s, dir, "documents"), col("source"))
      .select(col("group").as("source"),
        col("n_docs").cast("bigint").as("n_docs"), col("weight"))
      .orderBy(col("source")),
    Some("""WITH c AS (SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source),
      t AS (SELECT source, n_docs,
        CAST(sqrt(CAST(n_docs AS DOUBLE)) AS DECIMAL(20,12)) AS term FROM c),
      z AS (SELECT CAST(CAST(SUM(term) AS DECIMAL(38,12)) AS DOUBLE) AS z FROM t)
      SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
        CAST(term AS DOUBLE) / z AS weight
      FROM t, z ORDER BY source"""))

  /** Curriculum bucketing: rank docs per language by a quality score
    * (unigram fluency), split into deciles with ntile, and keep
    * per-decile quotas — "train on the best 30%, sample the middle,
    * drop the tail". ntile over (score, doc_id) is deterministic
    * because the order is total, so the bucket assignment — and
    * therefore the whole selection — replays in SQL. One per-lang
    * window shuffle plus the fluency table's own aggregations.
    */
  val xSampleCurriculum = Q(
    "x_sample_curriculum",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val docs = t(s, dir, "documents")
      val scored = Text.unigramLogProb(docs, "text", "doc_id")
        .select(col("doc_id"), col("mean_logprob"))
        .join(docs.select(col("doc_id"),
          Text.langId(col("text")).as("lang"),
          Text.fingerprint(col("text")).as("fp")), "doc_id")
      val w = Window.partitionBy(col("lang"))
        .orderBy(col("mean_logprob").desc, col("doc_id"))
      val rates = Map(1 -> 1000, 2 -> 1000, 3 -> 1000, 4 -> 500, 5 -> 500,
        6 -> 500, 7 -> 250, 8 -> 250, 9 -> 0, 10 -> 0)
      val rateCol = rates.foldLeft(lit(0)) { case (acc, (d, r)) =>
        when(col("decile") === d, r).otherwise(acc) }
      scored.withColumn("decile", ntile(10).over(w))
        .withColumn("kept", pmod(col("fp"), lit(1000)) < rateCol)
        .groupBy(col("lang"), col("decile"))
        .agg(count(lit(1)).cast("bigint").as("n_docs"),
          sum(when(col("kept"), 1).otherwise(0)).cast("bigint").as("n_kept"))
        .orderBy(col("lang"), col("decile"))
    },
    Some("""WITH tf AS (SELECT doc_id, term, count(*) AS tf FROM (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
        GROUP BY 1, 2),
      totals AS (SELECT CAST(SUM(tf) AS DOUBLE) AS n_tokens_corpus FROM tf),
      cnt AS (SELECT term, CAST(SUM(tf) AS DOUBLE) AS cnt FROM tf GROUP BY 1),
      contrib AS (SELECT doc_id, tf,
        CAST(CAST(tf AS DOUBLE) *
          CAST(CAST(ln(cnt / n_tokens_corpus) AS DECIMAL(20,12)) AS DOUBLE)
          AS DECIMAL(20,12)) AS c
        FROM tf JOIN cnt USING (term), totals),
      lp AS (SELECT doc_id,
        CAST(CAST(SUM(c) AS DECIMAL(38,12)) AS DOUBLE)
          / CAST(CAST(SUM(tf) AS BIGINT) AS DOUBLE) AS mean_logprob
        FROM contrib GROUP BY doc_id),
      sc AS (SELECT doc_id, text,
        len(regexp_extract_all(text, '[^\x00-\x7f]'))*10 + 5 AS s_zh,
        len(list_filter(string_split(text,' '), t -> list_contains(['the','a','of','and'], t)))*10 + 4 AS s_en,
        len(list_filter(string_split(text,' '), t -> list_contains(['der','die','das','und'], t)))*10 + 3 AS s_de,
        len(list_filter(string_split(text,' '), t -> list_contains(['le','la','les','et'], t)))*10 + 2 AS s_fr,
        len(list_filter(string_split(text,' '), t -> list_contains(['el','los','las','y'], t)))*10 + 1 AS s_es
        FROM documents),
      m AS (SELECT doc_id,
        CASE greatest(s_zh, s_en, s_de, s_fr, s_es) % 10
          WHEN 5 THEN 'zh' WHEN 4 THEN 'en' WHEN 3 THEN 'de' WHEN 2 THEN 'fr'
          ELSE 'es' END AS lang,
        list_reduce(
          list_prepend(CAST(0 AS BIGINT),
            list_transform(string_split(text, ' '),
              t -> CAST(len(t)*961 + ascii(t)*31 + ascii(t[-1]) AS BIGINT))),
          (a, x) -> (a*1000003 + x) % 2147483647) AS fp
        FROM sc),
      d AS (SELECT m.doc_id, m.lang, m.fp,
        CAST(ntile(10) OVER (PARTITION BY m.lang
          ORDER BY lp.mean_logprob DESC, m.doc_id) AS INTEGER) AS decile
        FROM m JOIN lp ON lp.doc_id = m.doc_id),
      r AS (SELECT lang, decile, fp,
        CASE WHEN decile <= 3 THEN 1000 WHEN decile <= 6 THEN 500
          WHEN decile <= 8 THEN 250 ELSE 0 END AS rate
        FROM d)
      SELECT lang, decile, CAST(COUNT(*) AS BIGINT) AS n_docs,
        CAST(SUM(CASE WHEN fp % 1000 < rate THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
      FROM r GROUP BY lang, decile ORDER BY lang, decile"""))

  /** Cross-source duplication audit — "which crawls overlap, and how
    * much": per unordered source pair, the number of distinct 20-token
    * segments present in both (whole-document digests never cross
    * sources in this corpus, so the segment granularity is what makes
    * the audit informative; it's also what a snapshot-dedup planner
    * actually acts on). Shape: segment explode → per-source distinct →
    * segment equi-join — at scale the join key becomes the segment
    * digest (exactByDigest's trick) and hot boilerplate segments get a
    * df-cutoff; the pair aggregate is O(#source pairs).
    */
  val xSourceOverlap = Q(
    "x_source_overlap",
    (s, dir) => {
      val docs = t(s, dir, "documents")
      val ch = graft.ext.Text.chunk(docs, "text", "doc_id",
          chunkTokens = 20, overlap = 0)
        .join(docs.select(col("doc_id"), col("source")), "doc_id")
        .select(col("source"), col("chunk_text")).distinct()
      ch.as("a").join(ch.as("b"),
          col("a.chunk_text") === col("b.chunk_text") &&
            col("a.source") < col("b.source"))
        .groupBy(col("a.source").as("source_a"), col("b.source").as("source_b"))
        .agg(count(lit(1)).cast("bigint").as("n_shared_segments"))
        .orderBy(col("source_a"), col("source_b"))
    },
    Some("""WITH d AS (SELECT doc_id, source, string_split(text, ' ') AS toks
        FROM documents),
      ch AS (SELECT source,
          unnest(list_transform(range(0, greatest(len(toks), 1), 20),
            s -> array_to_string(toks[s + 1 : s + 20], ' '))) AS chunk_text
        FROM d),
      ds AS (SELECT DISTINCT source, chunk_text FROM ch)
      SELECT a.source AS source_a, b.source AS source_b,
        CAST(COUNT(*) AS BIGINT) AS n_shared_segments
      FROM ds a JOIN ds b ON a.chunk_text = b.chunk_text AND a.source < b.source
      GROUP BY source_a, source_b ORDER BY source_a, source_b"""))

  val queries: Seq[Q] = Seq(
    xTextRepetition, xPiiRedact, xDecontaminate, xDecontaminateHashed,
    xDecontaminateFuzzy, xSampleMixture, xPipelineCurate, xSampleTokenBudget,
    xPackSequences, xSampleTemperature, xSampleCurriculum, xSourceOverlap)
}
