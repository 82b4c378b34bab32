package graft.queries

import org.apache.spark.sql.functions._
import graft.ext.{Model, Text}
import H.t

/** Round-16 operators: the continuous-curation streaming capstone's
  * order-free-prefix replay (the chained-CTE adjudication of the
  * [[graft.streaming.FunnelStream]] state fold the
  * [[graft.streaming.CurateStream]] driver opens with), and the
  * trained char-n-gram Naive Bayes language identifier that replaces
  * the marker heuristic ([[Text.langId]]) with a real
  * fastText-supervised classifier (Joulin et al. 2016).
  */
object ExtM {

  /** Deterministic per-language marker tail (appended ONCE), the
    * shared engine/oracle injection (the gopherBait / urlCol
    * convention): the corpus carries a `lang` LABEL but its text is
    * language-neutral by construction, so the fixture gives each class
    * the faint character signal a real multilingual crawl has. ONE
    * four-word tail against ~500 words of shared vocabulary is the
    * point of the fixture: the trained model classifies every doc from
    * it (500/500 at sf0.01 — ~15 class-exclusive grams × ~4–10 nats
    * each dwarf the near-zero log-odds of the shared mass), while the
    * marker heuristic — whose en markers also occur in the shared
    * vocabulary — loses ~18% of the corpus to marker-count ties the
    * tail cannot overcome. zh is BMP CJK, so the engine's UTF-16 grams
    * and the oracle's code-point grams agree.
    */
  private[graft] def langTail =
    when(col("lang") === "en", lit(" the of and a"))
      .when(col("lang") === "de", lit(" der die das und"))
      .when(col("lang") === "fr", lit(" le la les et"))
      .when(col("lang") === "es", lit(" el los las y"))
      .otherwise(lit(" 查询引擎数据分析"))

  private val langTailSql = """CASE lang
      WHEN 'en' THEN ' the of and a'
      WHEN 'de' THEN ' der die das und'
      WHEN 'fr' THEN ' le la les et'
      WHEN 'es' THEN ' el los las y'
      ELSE ' 查询引擎数据分析' END"""

  /** The full NB-langid train + score replay: model counts, smoothed
    * canonical log-likelihoods (add-1; unseen (class, gram) pairs via
    * the COALESCE arm), per-(doc, class) decimal contribution sums,
    * and the (score DESC, class ASC) argmax — mirroring
    * [[Model.naiveBayesLangId]] term by term (the nbCtesSql
    * discipline, lifted to multiclass char grams).
    */
  private val langIdNbCtes = s"""li AS MATERIALIZED (
        SELECT doc_id, lang, text || $langTailSql AS t FROM documents),
      lig AS (SELECT doc_id, lang, unnest(list_transform(
          range(1, length(t) - 1), i -> substr(t, i, 3))) AS gram
        FROM li WHERE length(t) >= 3),
      litf AS MATERIALIZED (SELECT doc_id, gram,
          CAST(COUNT(*) AS BIGINT) AS tf
        FROM lig GROUP BY doc_id, gram),
      licg AS MATERIALIZED (SELECT lang AS y, gram,
          CAST(COUNT(*) AS BIGINT) AS cnt
        FROM lig GROUP BY y, gram),
      linc AS MATERIALIZED (SELECT y,
          CAST(SUM(cnt) AS BIGINT) AS n_grams FROM licg GROUP BY y),
      liv AS MATERIALIZED (SELECT CAST(COUNT(DISTINCT gram) AS BIGINT)
          AS v FROM licg),
      licls AS MATERIALIZED (SELECT lang AS y,
          CAST(COUNT(*) AS BIGINT) AS n_docs FROM li GROUP BY y),
      lipri AS MATERIALIZED (SELECT y,
          CAST(CAST(ln(CAST(n_docs AS DOUBLE) /
            CAST((SELECT SUM(n_docs) FROM licls) AS DOUBLE))
            AS VARCHAR) AS DECIMAL(20,6)) AS lprior,
          COALESCE((SELECT n_grams FROM linc WHERE linc.y = licls.y), 0)
            AS n_grams
        FROM licls),
      lisum AS MATERIALIZED (SELECT tf.doc_id, p.y,
          CAST(SUM(CAST(tf.tf AS DECIMAL(12,0)) *
            CAST(CAST(ln(CAST(COALESCE(cg.cnt, 0) + 1 AS DOUBLE) /
              CAST(p.n_grams + (SELECT v FROM liv) AS DOUBLE))
              AS VARCHAR) AS DECIMAL(20,6))) AS DECIMAL(38,6)) AS s
        FROM litf tf CROSS JOIN lipri p
        LEFT JOIN licg cg ON cg.y = p.y AND cg.gram = tf.gram
        GROUP BY tf.doc_id, p.y),
      lisc AS MATERIALIZED (SELECT li.doc_id, li.lang, p.y,
          CAST(p.lprior + COALESCE(s.s, 0) AS DOUBLE) AS score
        FROM li CROSS JOIN lipri p
        LEFT JOIN lisum s ON s.doc_id = li.doc_id AND s.y = p.y),
      lipred AS MATERIALIZED (SELECT doc_id, lang, y AS pred_lang,
          score AS score_best
        FROM lisc
        QUALIFY row_number() OVER (PARTITION BY doc_id
          ORDER BY score DESC, y ASC) = 1)"""

  /** Trained language ID ([[Model.naiveBayesLangId]], char 3-grams)
    * on the marker-tailed corpus: per-doc true label, argmax
    * prediction, and winning log posterior — training and scoring
    * both replayed, so one perturbed count anywhere flips the hash.
    */
  val xTextLangidModel = Q(
    "x_text_langid_model",
    (s, dir) => {
      val docs = t(s, dir, "documents")
      val inj = docs.select(col("doc_id"), col("lang"),
        concat(col("text"), langTail).as("t"))
      Model.naiveBayesLangId(inj, "t", "doc_id", "lang", n = 3)
        .join(inj.select(col("doc_id"), col("lang")), "doc_id")
        .select(col("doc_id"), col("lang"), col("pred_lang"),
          col("score_best"))
        .orderBy(col("doc_id"))
    },
    Some(s"""WITH $langIdNbCtes
      SELECT doc_id, lang, pred_lang, score_best
      FROM lipred ORDER BY doc_id"""))

  /** Confusion matrix of the TRAINED identifier against the marker
    * HEURISTIC on the same tailed corpus — the measurement the r16
    * upgrade is judged by: at sf0.01 the trained model is exactly
    * diagonal (500/500) while the heuristic misroutes ~18% of docs to
    * `en` (its markers also live in the shared vocabulary, so base-text
    * marker counts out-vote the single 4-word tail) — the classic
    * heuristic-vs-learned gap, adjudicated hash-exact.
    */
  val xTextLangidModelEval = Q(
    "x_text_langid_model_eval",
    (s, dir) => {
      val docs = t(s, dir, "documents")
      val inj = docs.select(col("doc_id"), col("lang"),
        concat(col("text"), langTail).as("t"))
      Model.naiveBayesLangId(inj, "t", "doc_id", "lang", n = 3)
        .join(inj.select(col("doc_id"), col("lang"),
          Text.langId(col("t")).as("pred_heuristic")), "doc_id")
        .groupBy(col("lang"), col("pred_lang"), col("pred_heuristic"))
        .agg(count(lit(1)).cast("bigint").as("n"))
        .orderBy(col("lang"), col("pred_lang"), col("pred_heuristic"))
    },
    Some(s"""WITH $langIdNbCtes,
      hsc AS (SELECT doc_id,
        len(regexp_extract_all(t, '[^\\x00-\\x7f]'))*10 + 5 AS s_zh,
        len(list_filter(string_split(t,' '),
          w -> list_contains(['the','a','of','and'], w)))*10 + 4 AS s_en,
        len(list_filter(string_split(t,' '),
          w -> list_contains(['der','die','das','und'], w)))*10 + 3 AS s_de,
        len(list_filter(string_split(t,' '),
          w -> list_contains(['le','la','les','et'], w)))*10 + 2 AS s_fr,
        len(list_filter(string_split(t,' '),
          w -> list_contains(['el','los','las','y'], w)))*10 + 1 AS s_es
        FROM li),
      hpred AS (SELECT doc_id,
          CASE greatest(s_zh, s_en, s_de, s_fr, s_es) % 10
            WHEN 5 THEN 'zh' WHEN 4 THEN 'en' WHEN 3 THEN 'de'
            WHEN 2 THEN 'fr' ELSE 'es' END AS pred_heuristic
        FROM hsc)
      SELECT p.lang, p.pred_lang, h.pred_heuristic,
        CAST(COUNT(*) AS BIGINT) AS n
      FROM lipred p JOIN hpred h USING (doc_id)
      GROUP BY p.lang, p.pred_lang, h.pred_heuristic
      ORDER BY p.lang, p.pred_lang, h.pred_heuristic"""))

  /** The continuous-curation driver's order-free prefix, adjudicated
    * through the REAL streaming state machinery: the documents corpus
    * arrives as three `doc_id mod 3` micro-batches and each runs
    * [[graft.streaming.FunnelStream.applyBatch]] — encoding → Gopher →
    * CCNet fluency against the corpus-trained static model, plus the
    * intra-document span-dedup stage over the fluent survivors (the
    * streaming master's stage 5, per-doc pure so it joins the
    * order-free prefix — r17), cumulative
    * counts folded through the generation-addressed state dir. The
    * oracle computes every per-doc verdict ONCE (they are pure
    * per-document functions of the static model — the order-free
    * property; the intra stage via the shared spanDedupCtes per-doc
    * replay), groups them by batch, and replays the cumulative fold
    * as a running window — so the engine's state reads/writes must
    * reproduce plain prefix sums exactly, batch by batch.
    */
  val xCurateStreamFunnel = Q(
    "x_curate_stream_funnel",
    (s, dir) => {
      val docs = t(s, dir, "documents")
      // one pinned LM training shared by the cutoff and all three
      // batches (r20 — this query used to train the model four times)
      val lm = graft.ext.Text.bigramLmTrain(docs, "text")
      val (cutLp, cutId) = graft.streaming.FunnelStream
        .fluencyCutoff(docs, "text", "doc_id", model = Some(lm))
      val inj = docs.select(col("doc_id"), col("text"),
        concat(col("text"), ExtI.encGarbage, ExtI.gopherBait).as("tinj"))
      val statePath = H.tempStateDir("graft_curate_funnel") + "/state"
      (0 until 3).map { b =>
        graft.streaming.FunnelStream.applyBatch(
          inj.filter(pmod(col("doc_id"), lit(3)) === b),
          statePath, b.toLong, docs, cutLp, cutId,
          "text", "tinj", "doc_id", model = Some(lm))
      }.reduce(_.unionByName(_)).orderBy(col("batch_id"))
    },
    Some(s"""${Ext.bigramLmCtes},
      ${Ext.rankBucketCtes},
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
          e.is_clean, g.pass, bk.bucket
        FROM enc e JOIN gr g USING (doc_id) LEFT JOIN bk USING (doc_id)),
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

  /** The r16 library face adjudicated standalone (not only inside the
    * master chain): digest-keyed exact-first collapse + pair face +
    * member expansion ([[graft.ext.Dedup.nearDupDropExactFirst]]) on
    * the raw documents table. The oracle replays the RAW pairwise
    * earlier-occurrence-wins rule — the verdict the collapse face is
    * provably equivalent to — including [[graft.ext.Dedup.shingleIndex]]'s
    * sub-3-token whole-text fallback branch.
    */
  val xDedupDropExactFirst = Q(
    "x_dedup_drop_exact_first",
    (s, dir) => graft.ext.Dedup.nearDupDropExactFirst(
      t(s, dir, "documents"), "text", "doc_id", k = 3, threshold = 0.5)
      .orderBy(col("doc_id")),
    Some("""WITH wd AS (SELECT doc_id, text, string_split(text, ' ') AS w
        FROM documents),
      sh AS (
        SELECT DISTINCT doc_id,
            unnest(list_transform(range(1, len(w) - 1),
              i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
          FROM wd WHERE len(w) >= 3
        UNION ALL
        SELECT doc_id, text AS s FROM wd WHERE len(w) < 3),
      cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
      inter AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS ix
        FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY da, db)
      SELECT DISTINCT db AS doc_id FROM inter
      JOIN cnt ca ON ca.doc_id = da JOIN cnt cb ON cb.doc_id = db
      WHERE CAST(ix AS DOUBLE) / (ca.n + cb.n - ix) >= 0.5
      ORDER BY doc_id"""))

  /** Held-out NB quality filtering ([[Model.naiveBayesFilterUnder]]):
    * the production classifier shape — train on the even-doc_id seed
    * split (gopher-pass weak labels, the x_quality_model_filter
    * convention), score the odd-doc_id held-out docs against their
    * own labels. OOV tokens are excluded from scores (the
    * bigramLogProbUnder restriction); the oracle replays the split
    * training AND the held-out scoring, so train/score leakage in
    * either direction flips the hash.
    */
  val xQualityModelHoldout = Q(
    "x_quality_model_holdout",
    (s, dir) => {
      val docs = t(s, dir, "documents")
      val labeled = docs.join(
        Text.gopherRules(docs, "text", "doc_id")
          .select(col("doc_id"), col("pass").as("label")), "doc_id")
      Model.naiveBayesFilterUnder(
        labeled.filter(pmod(col("doc_id"), lit(2)) === 1),
        labeled.filter(pmod(col("doc_id"), lit(2)) === 0),
        "text", "doc_id", "label")
        .orderBy(col("doc_id"))
    },
    Some(s"""WITH inj AS (SELECT doc_id, text AS t FROM documents),
      ${ExtI.gopherCtesSql},
      lab AS (SELECT doc_id, pass AS label FROM gr),
      tk AS (SELECT d.doc_id, token, label FROM
          (SELECT doc_id, unnest(string_split(text, ' ')) AS token
           FROM documents) d
        JOIN lab USING (doc_id) WHERE length(token) > 0),
      cnts AS (SELECT token,
          CAST(SUM(CASE WHEN label THEN 1 ELSE 0 END) AS BIGINT)
            AS cnt_pos,
          CAST(SUM(CASE WHEN label THEN 0 ELSE 1 END) AS BIGINT)
            AS cnt_neg
        FROM tk WHERE doc_id % 2 = 0 GROUP BY token),
      tot AS (SELECT CAST(SUM(cnt_pos) AS BIGINT) AS n_pos,
          CAST(SUM(cnt_neg) AS BIGINT) AS n_neg,
          CAST(COUNT(*) AS BIGINT) AS v FROM cnts),
      model AS (SELECT token,
          CAST(CAST(ln(CAST(cnt_pos + 1 AS DOUBLE) /
            CAST(n_pos + v AS DOUBLE)) AS DECIMAL(20,12)) AS DOUBLE)
            AS lp_pos,
          CAST(CAST(ln(CAST(cnt_neg + 1 AS DOUBLE) /
            CAST(n_neg + v AS DOUBLE)) AS DECIMAL(20,12)) AS DOUBLE)
            AS lp_neg
        FROM cnts, tot),
      htf AS (SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
        FROM tk WHERE doc_id % 2 = 1 GROUP BY doc_id, token),
      hsums AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_tokens,
          CAST(SUM(CAST(CAST(tf AS DOUBLE) * lp_pos AS DECIMAL(30,14)))
            AS DOUBLE) AS s_pos,
          CAST(SUM(CAST(CAST(tf AS DOUBLE) * lp_neg AS DECIMAL(30,14)))
            AS DOUBLE) AS s_neg
        FROM htf JOIN model USING (token) GROUP BY doc_id),
      hpri AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
          CAST(SUM(CASE WHEN label THEN 1 ELSE 0 END) AS BIGINT)
            AS n_pos_docs
        FROM lab WHERE doc_id % 2 = 0),
      hpr AS (SELECT
          CAST(CAST(ln(CAST(n_pos_docs AS DOUBLE) /
            CAST(n_docs AS DOUBLE)) AS DECIMAL(20,12)) AS DOUBLE)
            AS lprior_pos,
          CAST(CAST(ln(CAST(n_docs - n_pos_docs AS DOUBLE) /
            CAST(n_docs AS DOUBLE)) AS DECIMAL(20,12)) AS DOUBLE)
            AS lprior_neg FROM hpri),
      hsc AS (SELECT l.doc_id, COALESCE(n_tokens, 0) AS n_tokens,
          COALESCE(s_pos, 0.0) + lprior_pos AS score_pos,
          COALESCE(s_neg, 0.0) + lprior_neg AS score_neg, label
        FROM (SELECT * FROM lab WHERE doc_id % 2 = 1) l
        LEFT JOIN hsums USING (doc_id), hpr)
      SELECT doc_id, n_tokens, score_pos, score_neg, label,
        (score_pos > score_neg) AS predicted,
        ((score_pos > score_neg) = label) AS correct
      FROM hsc ORDER BY doc_id"""))

  /** The v1 signal replay, factored so the v3 wide row (ExtO) chains
    * the IDENTICAL CTEs — the shared-CTE discipline: the two signal
    * generations can never drift. Expects `lpq`/`bk` (the JM LM + rank
    * chain) already in scope; ends with every v1 signal CTE through
    * `qcont`.
    */
  private[queries] val signalsV1Ctes: String =
    s"""inj AS (SELECT doc_id, text AS t FROM documents),
      ${ExtI.gopherCtesSql},
      qrow AS (SELECT doc_id,
          CAST(length(text) AS INTEGER) AS n_chars,
          CAST(len(string_split(text, ' ')) AS INTEGER) AS n_words,
          CAST(list_sum(list_transform(string_split(text, ' '),
            w -> len(w))) AS DOUBLE) / len(string_split(text, ' '))
            AS mean_word_len,
          CAST(len(list_filter(string_split(text, ' '),
            w -> list_contains(['the','a','an','of','and','or','to',
              'in','is','it'], w))) AS DOUBLE)
            / len(string_split(text, ' ')) AS stopword_frac,
          CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) /
            len(string_split(text, ' ')) AS frac_unique_words
        FROM documents),
      qg AS (SELECT doc_id, unnest(list_transform(range(1, len(w)),
          i -> w[i] || ' ' || w[i+1])) AS gram
        FROM (SELECT doc_id, string_split(text, ' ') AS w
          FROM documents)),
      qc AS (SELECT doc_id, gram, count(*) AS c FROM qg GROUP BY 1, 2),
      qa AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n2,
          CAST(COUNT(*) AS BIGINT) AS d2, CAST(MAX(c) AS BIGINT) AS t2
        FROM qc GROUP BY 1),
      qh AS (SELECT doc_id,
        len(regexp_extract_all(text, '[^\\x00-\\x7f]'))*10 + 5 AS s_zh,
        len(list_filter(string_split(text,' '),
          w -> list_contains(['the','a','of','and'], w)))*10 + 4 AS s_en,
        len(list_filter(string_split(text,' '),
          w -> list_contains(['der','die','das','und'], w)))*10 + 3 AS s_de,
        len(list_filter(string_split(text,' '),
          w -> list_contains(['le','la','les','et'], w)))*10 + 2 AS s_fr,
        len(list_filter(string_split(text,' '),
          w -> list_contains(['el','los','las','y'], w)))*10 + 1 AS s_es
        FROM documents),
      qlang AS (SELECT doc_id,
          CASE greatest(s_zh, s_en, s_de, s_fr, s_es) % 10
            WHEN 5 THEN 'zh' WHEN 4 THEN 'en' WHEN 3 THEN 'de'
            WHEN 2 THEN 'fr' ELSE 'es' END AS pred_lang
        FROM qh),
      qtok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tk
        FROM documents),
      qtf AS (SELECT doc_id, tk, CAST(COUNT(*) AS BIGINT) AS c FROM qtok
        WHERE len(tk) > 0 GROUP BY doc_id, tk),
      qent0 AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
          SUM(CAST(CAST(c AS DOUBLE)
            * CAST(CAST(CAST(ln(CAST(c AS DOUBLE)) AS VARCHAR)
                AS DECIMAL(20,12)) AS DOUBLE)
            AS DECIMAL(30,14))) AS s
        FROM qtf GROUP BY doc_id),
      qent AS (SELECT doc_id,
          CAST(CAST(CAST(
            CAST(CAST(CAST(ln(CAST(n_tokens AS DOUBLE)) AS VARCHAR)
              AS DECIMAL(20,12)) AS DOUBLE)
            - CAST(s AS DOUBLE) / CAST(n_tokens AS DOUBLE)
            AS VARCHAR) AS DECIMAL(20,12)) AS DOUBLE) AS token_entropy
        FROM qent0),
      qeg AS (SELECT DISTINCT
          unnest(list_transform(range(1, len(w) - 3),
            i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' '
              || w[i+3] || ' ' || w[i+4])) AS gram
        FROM (SELECT string_split(text, ' ') AS w FROM documents
          WHERE doc_id < 20)),
      qcg AS (SELECT DISTINCT doc_id,
          unnest(list_transform(range(1, len(w) - 3),
            i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' '
              || w[i+3] || ' ' || w[i+4])) AS gram
        FROM (SELECT doc_id, string_split(text, ' ') AS w
          FROM documents)),
      qcont AS (SELECT DISTINCT doc_id, TRUE AS c
        FROM qcg JOIN qeg USING (gram))"""

  /** The v1 select list + joins, shared with the v3 row for the same
    * no-drift reason. `extraCols`/`extraJoins` splice the v3 additions.
    */
  private[queries] def signalsV1Select(extraCols: String = "",
      extraJoins: String = ""): String =
    s"""SELECT q.doc_id, q.n_chars, q.n_words, q.mean_word_len,
        q.stopword_frac, q.frac_unique_words,
        CAST(a.t2 AS DOUBLE) / CAST(a.n2 AS DOUBLE) AS top_gram_frac,
        1.0 - CAST(a.d2 AS DOUBLE) / CAST(a.n2 AS DOUBLE)
          AS dup_gram_frac,
        ql.pred_lang, gr.pass AS gopher_pass, e.token_entropy,
        bk.mean_logprob, bk.bucket AS ppl_bucket,
        COALESCE(ct.c, FALSE) AS contaminated$extraCols
      FROM qrow q
      JOIN qlang ql USING (doc_id)
      JOIN gr USING (doc_id)
      LEFT JOIN qa a USING (doc_id)
      LEFT JOIN qent e USING (doc_id)
      LEFT JOIN bk USING (doc_id)
      LEFT JOIN qcont ct USING (doc_id)$extraJoins
      ORDER BY q.doc_id"""

  /** The RedPajama-V2-style quality-signals table
    * ([[Text.qualitySignals]]): ONE wide row per document bundling the
    * audited signals — size/shape, lexical diversity, repetition,
    * entropy, language, Gopher verdict, CCNet fluency, leakage — the
    * per-doc parquet a curation pipeline writes beside the corpus so
    * downstream users filter without recomputing. The oracle joins the
    * SHARED signal replays (LM + rank buckets, gopher, entropy,
    * repetition, langid, contamination) into the same wide row, so
    * drift in ANY signal flips the hash.
    */
  val xQualitySignals = Q(
    "x_quality_signals",
    (s, dir) => {
      val docs = t(s, dir, "documents")
      Text.qualitySignals(docs, docs.filter(col("doc_id") < 20),
        "text", "doc_id")
        .orderBy(col("doc_id"))
    },
    Some(s"""${Ext.bigramLmCtes},
      ${Ext.rankBucketCtes},
      $signalsV1Ctes
      ${signalsV1Select()}"""))

  val queries: Seq[Q] = Seq(xTextLangidModel, xTextLangidModelEval,
    xCurateStreamFunnel, xDedupDropExactFirst, xQualityModelHoldout,
    xQualitySignals)
}
