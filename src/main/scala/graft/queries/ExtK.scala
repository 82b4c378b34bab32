package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ext._
import H.t

/** Round-14 operators: the master-recipe curation capstone — the full
  * FineWeb/Dolma production chain as ONE adjudicated attrition table —
  * plus this round's gate-repair work recorded in ExtI/ExtJ (paragraph
  * faces' `eager` flag, the per-stage MATERIALIZED unigram oracle).
  */
object ExtK {

  private def ntoks(c: Column): Column =
    size(split(c, " ")).cast("long")

  /** The deterministic synthetic URL of `x_url_domain` (ExtB) — the
    * corpus carries no URL column, so the construction is the shared
    * engine/oracle injection, reused verbatim. private[graft] so the
    * MasterTime stage profiler measures the SAME construction (never a
    * re-inlined copy that could drift).
    */
  private[graft] def urlCol: Column = concat(
    lit("https://"),
    when(pmod(col("doc_id"), lit(3)) === 0, lit("www.")).otherwise(lit("")),
    col("source"), lit("-site."),
    when(col("lang") === "en", lit("com")).otherwise(lit("org")),
    lit("/docs/"), col("doc_id"),
    when(pmod(col("doc_id"), lit(2)) === 0,
      concat(lit("?ref="), col("source"))).otherwise(lit("")))

  /** Blocklisted registered domains for the URL-filter stage (two bad
    * sources, both TLD variants — the UT1/Blacklists-style domain cut
    * every crawl pipeline opens with). private[graft]: shared with the
    * MasterTime profiler.
    */
  private[graft] val blockedDomains = Seq(
    "src3-site.com", "src3-site.org", "src7-site.com", "src7-site.org")

  /** Master-recipe curation capstone: the COMPLETE production chain in
    * FineWeb/Dolma order, each stage the already-adjudicated operator,
    * emitting the per-stage attrition table every curation run is
    * judged by. Docs 0–19 are the stand-in eval benchmark (the
    * x_decontaminate convention); the corpus is doc_id ≥ 20.
    *
    *  0. corpus           — raw docs + whitespace-token count
    *  1. url_filter       — synthetic URL (x_url_domain construction),
    *                        registered-domain blocklist cut
    *  2. encoding         — U+FFFD/C0/C1 screen on the injected "crawl
    *                        bytes" (encGarbage — the raw corpus is
    *                        clean); the clean text enters the pipeline
    *  3. gopher           — Rae et al. Table A1 composite on the same
    *                        injected text
    *  4. fluency          — CCNet bucket < 2 under the corpus-trained
    *                        bigram LM + full-corpus rank buckets (CCNet
    *                        scores against a reference LM and global
    *                        thresholds, so the shared bigramLmCtes /
    *                        rankBucketCtes replay is reused VERBATIM)
    *  5. intra_dedup      — within-doc 3-token span removal (RefinedWeb)
    *  6. paragraph_dedup  — 20-token paragraph MinHash at j ≥ 0.8 (Dolma)
    *  7. whole_doc_dedup  — 3-gram Jaccard ≥ 0.5, earlier-occurrence-
    *                        wins document removal; TWO registered
    *                        faces: exact AllPairs (x_pipeline_master)
    *                        and the MinHash+LSH band join the
    *                        production pipelines run at 100 TB
    *                        (x_pipeline_master_lsh) — both adjudicated
    *                        against the same exhaustive exact replay
    *  8. span_dedup       — corpus-wide 10-token span excision (C4/Lee
    *                        et al.) + the < 20-surviving-tokens drop
    *  9. decontaminate    — 5-gram overlap vs the eval set, any hit drops
    * 10. mixture          — per-source balance: each source capped at
    *                        120% of the equal share (pure integer
    *                        arithmetic: (12N + 10k − 1) div 10k)
    * 11. pack             — per-source BFD into 64-token sequences; the
    *                        row reports sequences produced (n_docs) and
    *                        the padded token budget (n_tokens = bins·64)
    *
    * Every row is (stage_idx, stage, n_docs, n_tokens) — n_tokens is
    * the surviving whitespace-token volume (the spanDedup stages use
    * their own n_kept_tokens, which the oracle replays identically).
    * The oracle chains the SHARED stage replays — gopherCtesSql,
    * bigramLmCtes + rankBucketCtes, spanDedupCtes ×2, paraDedupCtes,
    * the cluster-oracle Jaccard CTEs, the decontaminate gram join, and
    * packBfdCoreCtes — so any drift in ANY stage cascades into every
    * later row.
    *
    * Scale shape (100 TB): the chain is exactly the audited operators
    * in sequence — no stage adds a new shuffle class. Filters (1–4)
    * are narrow flag joins; the dedup ladder carries the clone-
    * invariant exact-first paragraph pass and fingerprint-keyed span
    * passes; stage 7's exact AllPairs face is prefix-filtered but
    * still pair-verification-bound — at 100 TB the production choice
    * is the LSH face (the twin), whose band join is bucketed and whose
    * ladder position structurally protects it (paragraph dedup has
    * already excised clone mass by stage 7 — measured in ScaleBench
    * `master`); decontaminate broadcasts the (bounded) eval-gram set;
    * mixture is one per-source window over survivors; packing runs
    * per-source BFD groups (shard composer available for hot groups).
    */
  /** Sequence length of the pack stage. */
  private[graft] val masterSeqLen = 64L

  /** One materialized stage of the master chain, as handed to the
    * caller's `pin` callback and returned in the attrition list.
    */
  private[graft] final case class MasterStage(idx: Int, name: String,
      df: DataFrame, tok: Column)

  /** The master chain, built ONCE for every consumer — the registered
    * queries (exact and LSH whole-doc faces), the MasterTime stage
    * profiler, and the ScaleBench master section — so no copy can
    * drift from the adjudicated chain (the shared-CTE discipline,
    * applied to the engine side).
    *
    * `pin(name, df)` is called in CHAIN ORDER on every intermediate the
    * chain reuses or reports; the caller decides persistence (the
    * capstone caches + counts the heavy stages SEQUENTIALLY — letting
    * the final 12-branch union materialize them lazily makes
    * concurrent branches race-compute the same cache partitions:
    * BlockManager "already exists" storms, measured 31.8 s vs ~14 s at
    * sf0.01 for the identical plan — a profiler laps each pin). The
    * chain continues from pin's RETURN value.
    *
    * `lshWholeDoc` selects stage 7's face: exact AllPairs 3-gram
    * Jaccard ([[Dedup.ngramJaccardPairs]]) or the 100 TB production
    * face, MinHash+LSH band join ([[Dedup.minhashLshPairs]], 128
    * hashes / 32 bands). Verification is exact Jaccard either way (no
    * false positives); the LSH face can only deterministically MISS a
    * band for a true pair — P ≈ (1−j⁴)³² per pair (~1.3e-1 at j=0.50
    * exactly, 1.2e-2 at j=0.6, 1.5e-4 at j=0.7, 5e-8 at j=0.8) — so
    * the twin query adjudicates it against the SAME exhaustive exact
    * replay, and a miss fails the gate loudly instead of hiding.
    *
    * Returns the 11 attrition stages (idx 0–10) plus the pack-bins
    * 1-row aggregate (`nb`).
    */
  /** Stage-7 representative set — [[Dedup.wholeDocReps]] on the
    * chain's columns (digest-keyed exact collapse; shared by the chain
    * via [[Dedup.nearDupDropExactFirst]] and by the ScaleBench face
    * comparison). No eligibility filter: [[Dedup.shingleIndex]] gives
    * a sub-k-token doc its WHOLE TEXT as a single shingle, so even two
    * identical short (or empty) texts share an identical non-empty
    * shingle set and pair at j = 1 under the raw faces — every
    * identical-text group collapses.
    */
  private[graft] def wholeDocReps(t6: DataFrame): DataFrame =
    Dedup.wholeDocReps(t6, "text", "doc_id")

  /** `suffixSpan8` selects stage 8's face: the fingerprint-keyed
    * sliding-window excision ([[Dedup.spanDedupHashed]], 8-byte
    * rolling-fold keys — admits 64-bit collisions) or the EXACT
    * suffix-array excision ([[graft.ext.Suffix.exciseDupSpans]],
    * rank-identity keys, collision-free at any span length). Both
    * rank every window by its minimal (doc, start) occurrence and
    * kill covered positions of later occurrences, so against the
    * text-keyed exact oracle the twin is a deterministic
    * hash-collision audit: a fingerprint collision (or any drift in
    * either keying) breaks exactly one face's hash. The measured
    * trade lives on the [[graft.ext.Suffix]] scaladoc and ScaleBench
    * `suffixstage`.
    */
  /** `learnedBlocklist` adds the FineWeb learned cut to stage 1: the
    * corpus's own per-domain Gopher-pass rollup (RAW text — the labels
    * a crawl pipeline has before injection; [[Web.domainQuality]],
    * τ = 0.5) derives the blocked set, and blocked domains' docs are
    * cut on top of the static list. The cut is a broadcast LEFT ANTI
    * join against the O(blocked domains) slice.
    */
  /** `knFluency` swaps stage 4's reference LM: the CCNet-faithful face
    * scores under the Kneser–Ney model ([[Text.perplexityBucketsKn]] —
    * KenLM is modified KN, Wenzek et al. 2020) instead of the
    * interpolated JM LM; the rank + integer-floor bucket cut is shared
    * ([[Text]]'s rankBuckets), so the two faces differ ONLY in the LM,
    * and the measured bucket agreement
    * (`x_quality_ppl_bucket_agreement`) predicts the attrition delta.
    */
  private[graft] def masterStages(all: DataFrame, lshWholeDoc: Boolean,
      pin: (String, DataFrame) => DataFrame,
      suffixSpan8: Boolean = false,
      learnedBlocklist: Boolean = false,
      knFluency: Boolean = false)
      : (Seq[MasterStage], DataFrame) = {
    val evalSet = all.filter(col("doc_id") < 20)
    val corpus = pin("corpus", all.filter(col("doc_id") >= 20)
      .select(col("doc_id"), col("text"), col("source"), col("lang")))

    // 1. URL filter on the synthetic URL's registered domain —
    // static blocklist, plus the LEARNED rollup verdict when asked.
    // NULL domains (unparseable url — e.g. a NULL source nulls the
    // whole concat) coalesce to '' and are KEPT, matching the r18
    // CurateStream stage-0 rule: a blocklist only removes KNOWN-bad
    // domains, and the batch and streaming twins of the same pipeline
    // must agree on malformed arrivals (unreachable with the
    // synthetic fixture urls, so no oracle moves)
    val s1static = Web.withUrlParts(corpus.withColumn("url", urlCol), "url")
      .filter(!coalesce(col("url_domain"), lit(""))
        .isin(blockedDomains: _*))
    val s1 = pin("url_filter",
      (if (!learnedBlocklist) s1static
       else {
         val gop = Text.gopherRules(corpus, "text", "doc_id")
           .select(col("doc_id"), col("pass"))
         val learned = Web.domainQuality(
             corpus.withColumn("url", urlCol).join(gop, "doc_id"),
             "url", "pass", minPassFrac = 0.5)
           .filter(col("blocked"))
           .select(col("url_domain").as("_lblk_domain"))
         s1static.join(broadcast(learned),
           col("url_domain") === col("_lblk_domain"), "left_anti")
       }).select(col("doc_id"), col("text")))

    // 2–3. byte-level filters see the injected "crawl bytes"; the
    // clean text enters the dedup ladder (the funnel discipline)
    val inj = s1.select(col("doc_id"),
      concat(col("text"), ExtI.encGarbage, ExtI.gopherBait).as("tinj"))
    val encOk = Text.encodingQuality(inj, "tinj", "doc_id")
      .filter(col("is_clean")).select("doc_id")
    val s2 = pin("encoding", s1.join(encOk, "doc_id"))
    val gphOk = Text.gopherRules(inj, "tinj", "doc_id")
      .filter(col("pass")).select("doc_id")
    val s3 = pin("gopher", s2.join(gphOk, "doc_id"))

    // 4. CCNet fluency cut: LM + buckets over the FULL raw corpus
    // (JM by default; KN — the CCNet-faithful reference — under the
    // knFluency switch)
    val pplOk = (if (knFluency)
        Text.perplexityBucketsKn(all, "text", "doc_id", nBuckets = 3)
      else Text.perplexityBuckets(all, "text", "doc_id", nBuckets = 3))
      .filter(col("bucket") < 2).select("doc_id")
    val s4 = pin("fluency", s3.join(pplOk, "doc_id"))

    // 5. intra-doc span dedup (rewrites text)
    val intra = pin("intra_dedup",
      Dedup.intraDocDedupHashed(s4, "text", "doc_id", span = 3))
    val t5 = intra.select(col("doc_id"), col("deduped_text").as("text"))

    // 6. paragraph dedup (rewrites text), ALWAYS the eager face: the
    // checkpoint pin is load-bearing for the whole downstream chain,
    // not just cache hygiene — with the lazy face (even cached by the
    // caller) the un-severed lineage made every later stage pay a
    // 60–280× planning penalty (measured at ×10 clones: span 202 s vs
    // 3.4 s, decontaminate 764 s vs 2.7 s on identical cached inputs)
    // and AQE's explain-string re-render OOM'd on the nested trees
    val para = Dedup.paragraphDedup(t5, "text", "doc_id",
      paraTokens = 20, minTokens = 5, threshold = 0.8)
    val t6 = pin("paragraph_dedup",
      para.select(col("doc_id"), col("deduped_text").as("text")))

    // 7. whole-doc near-dup removal (threshold 0.5, earlier wins) via
    // the library's exact-first collapse face — clone-invariant,
    // verdict-equivalent to the raw pairwise rule (the equivalence
    // argument lives on [[Dedup.nearDupDropExactFirst]]; the collapse
    // and member re-join are keyed on sha2 digests, never raw text —
    // paragraph dedup leaves every post-dedup clone the SAME residual
    // text, so clones collapse to one representative and the pair
    // face sees distinct content only)
    val dupDocs = Dedup.nearDupDropExactFirst(t6, "text", "doc_id",
      k = 3, threshold = 0.5, lsh = lshWholeDoc)
    val s7 = pin("whole_doc_dedup", t6.join(dupDocs, Seq("doc_id"), "left_anti"))

    // 8. corpus-wide span dedup + post-dedup length floor; the suffix
    // face rides the exact-first collapse (r17 — byte-equal to the raw
    // ladder by construction and content-bound under clones, the
    // measured §6 cure), so the registered exact face is the
    // production-credible one
    val g = pin("span_dedup_full",
      if (suffixSpan8) Suffix.exciseDupSpansExactFirst(s7, "text",
        "doc_id", spanLen = 10)
      else Dedup.spanDedupHashed(s7, "text", "doc_id", span = 10))
    val s8 = g.filter(col("n_kept_tokens") >= 20)
      .select(col("doc_id"), col("deduped_text").as("text"),
        col("n_kept_tokens"))

    // 9. benchmark decontamination (any 5-gram hit drops the doc)
    val contam = Text.contamination(s8, evalSet, "text", "doc_id", n = 5)
      .filter(col("contaminated")).select("doc_id")
    val s9 = pin("decontaminate", s8.join(contam, Seq("doc_id"), "left_anti"))

    // 10. mixture balance: cap every source at 120% of equal share
    val src9 = s9.join(corpus.select(col("doc_id"), col("source")), "doc_id")
    val mstat = src9.agg(count(lit(1)).cast("long").as("_n"),
      countDistinct(col("source")).cast("long").as("_k"))
    val s10 = pin("mixture", src9
      .withColumn("_rn", row_number().over(
        Window.partitionBy(col("source")).orderBy(col("doc_id"))))
      .crossJoin(broadcast(mstat))
      .filter(col("_rn") <= expr("(_n * 12 + _k * 10 - 1) div (_k * 10)"))
      .select(col("doc_id"), col("text"), col("n_kept_tokens"),
        col("source")))

    // 11. per-source BFD packing into S-token sequences
    val bins = Sampling.packBestFit(s10, col("source"), col("doc_id"),
        ntoks(col("text")), seqLen = masterSeqLen)
      .groupBy(col("group"))
      .agg(max(col("bin") + col("n_bins")).as("gbins"))
      .agg(coalesce(sum(col("gbins")), lit(0L)).cast("long").as("nb"))

    val stages = Seq(
      MasterStage(0, "corpus", corpus, ntoks(col("text"))),
      MasterStage(1, "url_filter", s1, ntoks(col("text"))),
      MasterStage(2, "encoding", s2, ntoks(col("text"))),
      MasterStage(3, "gopher", s3, ntoks(col("text"))),
      MasterStage(4, "fluency", s4, ntoks(col("text"))),
      MasterStage(5, "intra_dedup", intra, col("n_kept_tokens")),
      MasterStage(6, "paragraph_dedup", t6, ntoks(col("text"))),
      MasterStage(7, "whole_doc_dedup", s7, ntoks(col("text"))),
      MasterStage(8, "span_dedup", s8, col("n_kept_tokens")),
      MasterStage(9, "decontaminate", s9, col("n_kept_tokens")),
      MasterStage(10, "mixture", s10, col("n_kept_tokens")))
    (stages, bins)
  }

  /** Stages the capstone caches + counts sequentially (the heavy
    * multi-consumer intermediates; the rest are narrow projections of
    * their cached parent).
    */
  private val masterCached = Set("corpus", "fluency", "intra_dedup",
    "whole_doc_dedup", "span_dedup_full", "decontaminate", "mixture")

  /** Runs the chain and emits the 12-row attrition report (the shared
    * body of both registered faces).
    */
  private def runMaster(s: org.apache.spark.sql.SparkSession, dir: String,
      lshWholeDoc: Boolean, suffixSpan8: Boolean = false,
      learnedBlocklist: Boolean = false,
      knFluency: Boolean = false): DataFrame = {
    val caches = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    val (stages, bins) = masterStages(t(s, dir, "documents"), lshWholeDoc,
      (name, df) =>
        if (masterCached(name)) {
          val c = df.cache(); c.count(); caches += c; c
        } else df,
      suffixSpan8 = suffixSpan8, learnedBlocklist = learnedBlocklist,
      knFluency = knFluency)
    def row(st: MasterStage) =
      st.df.agg(count(lit(1)).cast("bigint").as("n_docs"),
          coalesce(sum(st.tok), lit(0L)).cast("bigint").as("n_tokens"))
        .select(lit(st.idx).as("stage_idx"), lit(st.name).as("stage"),
          col("n_docs"), col("n_tokens"))
    val rows = stages.map(row) :+
      bins.select(lit(11).as("stage_idx"), lit("pack").as("stage"),
        col("nb").as("n_docs"),
        (col("nb") * masterSeqLen).cast("bigint").as("n_tokens"))
    // 12-row report: pin it eagerly so every stage cache is released
    // now (the curate-v2/v3 capstone idiom)
    val out = rows.reduce(_.union(_)).orderBy(col("stage_idx"))
      .localCheckpoint(true)
    caches.foreach(_.unpersist())
    out
  }

  /** The chained replay of every stage — shared VERBATIM by both
    * registered faces: the exact face matches it by construction; the
    * LSH face matches it iff the band join found every true pair
    * (exact-Jaccard verification admits no false positives), so any
    * deterministic band miss fails the driver gate loudly — the
    * recall-oracle convention, applied to the whole chain.
    */
  private def masterOracle(learned: Boolean, kn: Boolean = false): String = {
    // the stage-4 LM block: the JM chain + shared rank buckets, or —
    // for the KN face — the shared KN replay with the SAME rank +
    // integer-floor cut, its bucket relation aliased `bk` so every
    // later CTE reads verbatim (the two faces differ ONLY here)
    val lmBlock =
      if (!kn) s"""${Ext.bigramLmCtes.stripPrefix("WITH ")},
      ${Ext.rankBucketCtes}"""
      else s"""${ExtN.knLmCtes("")},
      knrk AS (SELECT doc_id, n_bigrams, mean_logprob,
          CAST(row_number() OVER (ORDER BY mean_logprob DESC, doc_id)
            AS BIGINT) AS rn,
          CAST(COUNT(*) OVER () AS BIGINT) AS n
        FROM knlpq),
      bk AS (SELECT doc_id, n_bigrams, mean_logprob, rn,
          CAST(((rn - 1) * 3) // n AS INTEGER) AS bucket
        FROM knrk)"""
    // the learned-blocklist CTEs (r17): gopher on the RAW corpus text
    // (a second, lg-prefixed gopher chain beside stage 3's injected
    // one), the per-domain rollup, the strict-< blocked set
    val learnedCtes = if (!learned) "" else s"""
      lginj AS (SELECT doc_id, text AS t FROM corpus),
      ${ExtI.gopherCtes("lg", "lginj")},
      lgdd AS (SELECT uu.doc_id,
          regexp_extract(url_host, '([^.]+\\.[^.]+)$$', 1) AS url_domain,
          lggr.pass
        FROM uu JOIN lggr ON lggr.doc_id = uu.doc_id),
      lgblk AS MATERIALIZED (SELECT url_domain FROM lgdd
        GROUP BY url_domain
        HAVING CAST(SUM(CASE WHEN pass THEN 1 ELSE 0 END) AS DOUBLE)
          / CAST(COUNT(*) AS DOUBLE) < 0.5),"""
    val learnedCut = if (!learned) "" else s"""
          AND regexp_extract(url_host, '([^.]+\\.[^.]+)$$', 1) NOT IN
            (SELECT url_domain FROM lgblk)"""
    s"""WITH RECURSIVE $lmBlock,
      corpus AS MATERIALIZED (SELECT doc_id, text, source, lang
        FROM documents WHERE doc_id >= 20),
      uu AS (SELECT doc_id, text, source,
          lower(regexp_extract(
            'https://' || (CASE WHEN doc_id % 3 = 0 THEN 'www.' ELSE '' END)
              || source || '-site.'
              || (CASE WHEN lang = 'en' THEN 'com' ELSE 'org' END)
              || '/docs/' || doc_id
              || (CASE WHEN doc_id % 2 = 0 THEN '?ref=' || source
                  ELSE '' END),
            '^https?://([^/:?#]+)', 1)) AS url_host
        FROM corpus),$learnedCtes
      c1 AS MATERIALIZED (SELECT doc_id, text FROM uu
        WHERE regexp_extract(url_host, '([^.]+\\.[^.]+)$$', 1) NOT IN
          ('src3-site.com', 'src3-site.org',
           'src7-site.com', 'src7-site.org')$learnedCut),
      inj AS (SELECT doc_id, text || ${ExtI.encGarbageSql}
          || ${ExtI.gopherBaitSql} AS t
        FROM c1),
      enc AS (SELECT doc_id,
          ((length(t) - length(replace(t, chr(65533), ''))) = 0 AND
           (length(t) - length(regexp_replace(t,
             '[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]', '', 'g'))) = 0 AND
           (length(t) - length(regexp_replace(t,
             '[\\x80-\\x9F]', '', 'g'))) = 0) AS is_clean
        FROM inj),
      c2 AS (SELECT c1.* FROM c1 JOIN enc USING (doc_id) WHERE is_clean),
      ${ExtI.gopherCtesSql},
      c3 AS MATERIALIZED (SELECT c2.* FROM c2 JOIN gr USING (doc_id)
        WHERE pass),
      c4 AS MATERIALIZED (SELECT c3.* FROM c3 JOIN bk USING (doc_id)
        WHERE bucket < 2),
      ${ExtE.spanDedupCtes("mi", "c4", 3, perDoc = true)},
      c5 AS MATERIALIZED (SELECT doc_id, deduped_text AS text FROM mires),
      ${ExtI.paraDedupCtes("mp", "c5")},
      c6 AS MATERIALIZED (SELECT doc_id, deduped_text AS text FROM mpout),
      wd AS (SELECT doc_id, text, string_split(text, ' ') AS w FROM c6),
      -- shingleIndex's sub-k fallback, mirrored: a doc with < 3 tokens
      -- contributes its WHOLE TEXT as its single shingle, so identical
      -- short (even empty) residuals pair at j = 1 exactly as the
      -- engine faces see them
      wsh AS MATERIALIZED (
        SELECT DISTINCT doc_id,
            unnest(list_transform(range(1, len(w) - 1),
              i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
          FROM wd WHERE len(w) >= 3
        UNION ALL
        SELECT doc_id, text AS s FROM wd WHERE len(w) < 3),
      wcnt AS MATERIALIZED (SELECT doc_id, count(*) AS n FROM wsh
        GROUP BY doc_id),
      winter AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS ix
        FROM wsh a JOIN wsh b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY da, db),
      wrm AS MATERIALIZED (SELECT DISTINCT db AS doc_id FROM winter
        JOIN wcnt ca ON ca.doc_id = da JOIN wcnt cb ON cb.doc_id = db
        WHERE CAST(ix AS DOUBLE) / (ca.n + cb.n - ix) >= 0.5),
      c7 AS MATERIALIZED (SELECT * FROM c6
        WHERE doc_id NOT IN (SELECT doc_id FROM wrm)),
      ${ExtE.spanDedupCtes("mg", "c7", 10, perDoc = false)},
      c8 AS MATERIALIZED (SELECT doc_id, deduped_text AS text,
          n_kept_tokens
        FROM mgres WHERE n_kept_tokens >= 20),
      eg AS MATERIALIZED (SELECT DISTINCT
          unnest(list_transform(range(1, len(w) - 3),
            i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' '
              || w[i+3] || ' ' || w[i+4])) AS gram
        FROM (SELECT string_split(text, ' ') AS w FROM documents
          WHERE doc_id < 20)),
      cg AS (SELECT DISTINCT doc_id,
          unnest(list_transform(range(1, len(w) - 3),
            i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' '
              || w[i+3] || ' ' || w[i+4])) AS gram
        FROM (SELECT doc_id, string_split(text, ' ') AS w FROM c8)),
      contam AS (SELECT DISTINCT doc_id FROM cg JOIN eg USING (gram)),
      c9 AS MATERIALIZED (SELECT * FROM c8
        WHERE doc_id NOT IN (SELECT doc_id FROM contam)),
      src9 AS (SELECT c9.*, corpus.source FROM c9
        JOIN corpus USING (doc_id)),
      mstat AS MATERIALIZED (SELECT CAST(COUNT(*) AS BIGINT) AS n,
          CAST(COUNT(DISTINCT source) AS BIGINT) AS k
        FROM src9),
      mrk AS (SELECT *, row_number() OVER (PARTITION BY source
          ORDER BY doc_id) AS rn
        FROM src9),
      c10 AS MATERIALIZED (SELECT doc_id, text, n_kept_tokens, source
        FROM mrk, mstat
        WHERE rn <= (n * 12 + k * 10 - 1) // (k * 10)),
      ${ExtH.packBfdCoreCtes(64L,
        """d AS (SELECT source AS grp, doc_id,
          CAST(len(string_split(text, ' ')) AS BIGINT) AS toks
        FROM c10)""")},
      nbins AS (SELECT CAST(COALESCE(SUM(n_bins_bfd), 0) AS BIGINT) AS nb
        FROM summ)
      SELECT * FROM (
        SELECT CAST(0 AS INTEGER) AS stage_idx, 'corpus' AS stage,
          CAST(COUNT(*) AS BIGINT) AS n_docs,
          CAST(COALESCE(SUM(len(string_split(text, ' '))), 0) AS BIGINT)
            AS n_tokens FROM corpus
        UNION ALL SELECT 1, 'url_filter', COUNT(*),
          CAST(COALESCE(SUM(len(string_split(text, ' '))), 0) AS BIGINT)
          FROM c1
        UNION ALL SELECT 2, 'encoding', COUNT(*),
          CAST(COALESCE(SUM(len(string_split(text, ' '))), 0) AS BIGINT)
          FROM c2
        UNION ALL SELECT 3, 'gopher', COUNT(*),
          CAST(COALESCE(SUM(len(string_split(text, ' '))), 0) AS BIGINT)
          FROM c3
        UNION ALL SELECT 4, 'fluency', COUNT(*),
          CAST(COALESCE(SUM(len(string_split(text, ' '))), 0) AS BIGINT)
          FROM c4
        UNION ALL SELECT 5, 'intra_dedup', COUNT(*),
          CAST(COALESCE(SUM(n_kept_tokens), 0) AS BIGINT) FROM mires
        UNION ALL SELECT 6, 'paragraph_dedup', COUNT(*),
          CAST(COALESCE(SUM(len(string_split(text, ' '))), 0) AS BIGINT)
          FROM c6
        UNION ALL SELECT 7, 'whole_doc_dedup', COUNT(*),
          CAST(COALESCE(SUM(len(string_split(text, ' '))), 0) AS BIGINT)
          FROM c7
        UNION ALL SELECT 8, 'span_dedup', COUNT(*),
          CAST(COALESCE(SUM(n_kept_tokens), 0) AS BIGINT) FROM c8
        UNION ALL SELECT 9, 'decontaminate', COUNT(*),
          CAST(COALESCE(SUM(n_kept_tokens), 0) AS BIGINT) FROM c9
        UNION ALL SELECT 10, 'mixture', COUNT(*),
          CAST(COALESCE(SUM(n_kept_tokens), 0) AS BIGINT) FROM c10
        UNION ALL SELECT 11, 'pack', nb, nb * 64 FROM nbins
      ) ORDER BY stage_idx"""
  }

  private val masterOracleSql: String = masterOracle(learned = false)

  /** r18 default flip: stage 8 now runs the EXACT-FIRST suffix
    * excision ([[graft.ext.Suffix.exciseDupSpansExactFirst]]) — the
    * ×100 ScaleBench row settled the r17 trade: at ×100 clones the
    * exact face is faster in WALL TIME too (9.5 s / 445 MiB shuffled
    * vs the fingerprint face's 11.7 s / 1311 MiB) and content-bound
    * across ×10/×40/×100 (7.0 → 7.9 → 9.5 s), so exactness costs
    * nothing at scale and removes the 64-bit collision caveat from
    * the flagship chain. The fingerprint face stays REGISTERED on
    * `x_pipeline_master_lsh`/`_learned`/`_kn` (the standing
    * collision audit — all faces ride the same text-keyed replay).
    */
  val xPipelineMaster = Q(
    "x_pipeline_master",
    (s, dir) => runMaster(s, dir, lshWholeDoc = false, suffixSpan8 = true),
    Some(masterOracleSql),
    bench = true)

  /** The master chain with stage 7 on the engine's 100 TB-credible
    * whole-doc face — [[Dedup.minhashLshPairs]] band join (what
    * FineWeb/Dolma actually run at scale) instead of exact AllPairs.
    * Adjudicated against the SAME exhaustive exact replay
    * ([[masterOracleSql]]): the twin is hash-exact iff LSH recall is
    * 1.0 on this corpus (per-pair deterministic miss odds quantified
    * at [[masterStages]]); a recall regression cascades into rows
    * 7–11 and fails the gate by construction.
    */
  val xPipelineMasterLsh = Q(
    "x_pipeline_master_lsh",
    (s, dir) => runMaster(s, dir, lshWholeDoc = true),
    Some(masterOracleSql),
    bench = true)

  /** The master chain with stage 8 on the EXACT suffix-array excision
    * ([[graft.ext.Suffix.exciseDupSpans]] at the master's span 10 —
    * [[graft.ext.Suffix.ranksAt]]'s overlap combine handles the
    * non-dyadic length) and stage 7 on the LSH face — the most
    * 100 TB-credible combination of faces the engine has. Adjudicated
    * against the SAME text-keyed exhaustive replay
    * ([[masterOracleSql]]) as both fingerprint-keyed twins: the three
    * registered masters agree iff the 64-bit span fingerprints are
    * collision-free AND the rank-identity excision reproduces the
    * sliding-window semantics position for position — a standing
    * deterministic hash-collision audit, rows 8–11 failing loudly on
    * any divergence.
    */
  val xPipelineMasterSuffix = Q(
    "x_pipeline_master_suffix",
    (s, dir) => runMaster(s, dir, lshWholeDoc = true, suffixSpan8 = true),
    Some(masterOracleSql))

  /** The master chain with stage 1 carrying the LEARNED domain
    * blocklist on top of the static one (the actual FineWeb move —
    * Penedo et al. 2024 derive the blocked set from the corpus's own
    * per-domain quality rollup) and stage 7 on the LSH face: the
    * production stage-1 + stage-7 stack. The oracle chains a SECOND
    * (raw-text) gopher replay, the per-domain rollup, and the
    * strict-< blocked set into the stage-1 cut — the learned verdict
    * cascades through every later attrition row, so a drifted rollup
    * anywhere moves rows 1–11.
    */
  val xPipelineMasterLearned = Q(
    "x_pipeline_master_learned",
    (s, dir) => runMaster(s, dir, lshWholeDoc = true,
      learnedBlocklist = true),
    Some(masterOracle(learned = true)))

  /** The master chain with stage 4 scoring fluency under the
    * KNESER–NEY reference LM (the CCNet-faithful master — CCNet's
    * reference models are KenLM, i.e. modified KN) and stage 7 on the
    * LSH face. The oracle swaps ONLY the LM block — the shared KN
    * replay ([[ExtN.knLmCtes]]) feeding the SAME rank + integer-floor
    * bucket cut, aliased into `bk` so rows 4–11 read verbatim — so the
    * twin isolates the LM exchange, and the fluency row's delta vs
    * `x_pipeline_master` is exactly the bucket disagreement the
    * measured `x_quality_ppl_bucket_agreement` rate predicts
    * (agreement < 1 ⇒ different docs in the head/middle buckets ⇒ a
    * different survivor set cascading through every later stage).
    */
  val xPipelineMasterKn = Q(
    "x_pipeline_master_kn",
    (s, dir) => runMaster(s, dir, lshWholeDoc = true, knFluency = true),
    Some(masterOracle(learned = false, kn = true)), bench2 = true)

  val queries: Seq[Q] = Seq(xPipelineMaster, xPipelineMasterLsh,
    xPipelineMasterSuffix, xPipelineMasterLearned, xPipelineMasterKn)
}
