package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for LLM training-data pipelines
  * (BASELINE.json north star; SURVEY.md §2.8): tokenization, quality
  * scoring, language-ID heuristic, document fingerprinting — per-row
  * column expressions (narrow, codegen'd, shuffle-free) — plus the
  * corpus-relative rankers (TF-IDF, BM25), which need one aggregation
  * pass over the corpus for document frequencies.
  */
object Text {

  def tokens(text: Column): Column = split(text, " ")

  def wordCount(text: Column): Column = size(tokens(text))

  /** BPE-ish lexer token count: letter runs, digit runs, single
    * non-alnum marks.
    */
  val lexerPattern = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"
  def lexTokenCount(text: Column): Column = regexp_count(text, lit(lexerPattern))

  def punctCount(text: Column): Column = regexp_count(text, lit("[.,;:!?]"))

  val stopwords: Seq[String] = Seq(
    "the", "a", "an", "of", "and", "or", "to", "in", "is", "it")

  def stopwordCount(text: Column): Column =
    size(filter(tokens(text), t => t.isin(stopwords: _*)))

  /** Mean word length via exact integer sums then one double division
    * (deterministic across engines).
    */
  def meanWordLen(text: Column): Column = {
    val t = tokens(text)
    aggregate(t, lit(0), (acc, w) => acc + length(w)).cast("double") / size(t)
  }

  /** Language-ID heuristic: marker-word counts per language plus a
    * non-ASCII character count for CJK; argmax with a deterministic
    * priority tie-break encoded arithmetically (score = count*10 + prio,
    * decode prio from the max — no struct sorting needed, and the same
    * expression is trivially expressible in ANSI SQL for the oracle).
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and"),
    "de" -> Seq("der", "die", "das", "und"),
    "fr" -> Seq("le", "la", "les", "et"),
    "es" -> Seq("el", "los", "las", "y"))

  def markerCount(text: Column, markers: Seq[String]): Column =
    size(filter(tokens(text), t => t.isin(markers: _*)))

  def nonAsciiCount(text: Column): Column =
    regexp_count(text, lit("[^\\x00-\\x7F]"))

  /** Priorities: zh=5 > en=4 > de=3 > fr=2 > es=1; ties on count go to
    * the higher priority.
    */
  /** Latin accent-fold table (both engines share `translate`, so the
    * mapping replays exactly; full Unicode folding would use ICU —
    * a per-row library call with the same narrow shape).
    */
  val accentFrom = "àáâãäåèéêëìíîïòóôõöùúûüçñýÀÁÂÃÄÅÈÉÊËÌÍÎÏÒÓÔÕÖÙÚÛÜÇÑÝ"
  val accentTo = "aaaaaaeeeeiiiiooooouuuucnyAAAAAAEEEEIIIIOOOOOUUUUCNY"

  /** Canonical text normalization for dedup keys and matching: NFC-ish
    * accent fold, casefold, punctuation → space, whitespace collapse +
    * trim. Narrow, codegen'd, zero shuffles — runs in the same
    * projection as the quality signals.
    */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(
        lower(translate(text, accentFrom, accentTo)),
        "[\\p{Punct}]", " "),
      " +", " "))

  def langId(text: Column): Column = {
    val scores = Seq(
      nonAsciiCount(text) * 10 + 5,
      markerCount(text, langMarkers(0)._2) * 10 + 4,
      markerCount(text, langMarkers(1)._2) * 10 + 3,
      markerCount(text, langMarkers(2)._2) * 10 + 2,
      markerCount(text, langMarkers(3)._2) * 10 + 1)
    val best = greatest(scores: _*)
    when(best % 10 === 5, "zh")
      .when(best % 10 === 4, "en")
      .when(best % 10 === 3, "de")
      .when(best % 10 === 2, "fr")
      .otherwise("es")
  }

  /** ln(x) surfaced identically across engines: libm is not correctly
    * rounded (JVM vs DuckDB differ by 1 ulp on some inputs), so round
    * to 12 decimals — same trick as the q32 battery.
    */
  private[ext] def lnStable(c: Column): Column =
    log(c).cast("decimal(20,12)").cast("double")

  /** Long-form term frequencies: one row per (doc, term), whitespace
    * tokens like the rest of the family. One shuffle on (doc, term).
    */
  def termFreqs(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        explode(split(col(textCol), " ")).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))

  /** TF-IDF per (doc, term): smooth idf = ln((N+1)/(df+1)) + 1
    * (scikit-learn's formulation — public knowledge). Document
    * frequencies are one corpus aggregation broadcast back; at 100 TB
    * the df table is O(vocabulary) ≪ corpus and stays broadcastable.
    */
  def tfIdf(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val tf = termFreqs(docs, textCol, idCol)
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    tf.join(broadcast(dfreq), "term")
      .crossJoin(broadcast(nDocs))
      .withColumn("idf", lnStable((col("n_docs").cast("double") + 1.0) /
        (col("df").cast("double") + 1.0)) + 1.0)
      .withColumn("tfidf", col("tf").cast("double") * col("idf"))
      .select(col("doc_id"), col("term"), col("tf"), col("df"), col("tfidf"))
  }

  /** BM25 (Robertson/Sparck Jones — public literature) of every doc
    * against a fixed term set: idf = ln(1 + (N − df + 0.5)/(df + 0.5)),
    * score = Σ_t idf_t · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)).
    * Per-term contributions are rounded to DECIMAL(20,12) and summed
    * exactly, so the cross-partition addition order can't perturb the
    * result (the H.sum38 discipline). Query terms are O(1) and df/avgdl
    * are corpus scalars — everything broadcasts; the only data-sized
    * shuffle is the (doc, term) aggregation.
    */
  def bm25(docs: DataFrame, textCol: String, idCol: String,
      terms: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val base = docs.select(col(idCol).as("doc_id"),
      split(col(textCol), " ").as("toks"))
      .withColumn("dl", size(col("toks")).cast("long"))
    val stats = base.agg(count(lit(1)).as("n_docs"),
      (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
    val tf = base.select(col("doc_id"), col("dl"), explode(col("toks")).as("term"))
      .filter(col("term").isin(terms: _*))
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val perTerm = tf.join(broadcast(dfreq), "term")
      .crossJoin(broadcast(stats))
      .withColumn("idf", lnStable(lit(1.0) +
        (col("n_docs").cast("double") - col("df").cast("double") + 0.5) /
          (col("df").cast("double") + 0.5)))
      .withColumn("contrib",
        (col("idf") * (col("tf").cast("double") * (k1 + 1.0)) /
          (col("tf").cast("double") +
            lit(k1) * (lit(1.0 - b) + lit(b) * col("dl").cast("double") / col("avgdl"))))
          .cast("decimal(20,12)"))
    perTerm.groupBy(col("doc_id"))
      .agg(sum(col("contrib")).cast("decimal(38,12)").cast("double").as("score"))
  }

  /** Token-window chunking: each document becomes ⌈(len−overlap)/stride⌉
    * chunks of up to `chunkTokens` whitespace tokens overlapping by
    * `overlap` — the pretraining/RAG preprocessing step. Pure per-row
    * explode (narrow, codegen'd, no shuffle); chunk indices are
    * deterministic so downstream joins on (doc_id, chunk_idx) are
    * stable across runs.
    */
  def chunk(docs: DataFrame, textCol: String, idCol: String,
      chunkTokens: Int, overlap: Int): DataFrame = {
    require(overlap >= 0 && overlap < chunkTokens, "need 0 <= overlap < chunkTokens")
    val stride = chunkTokens - overlap
    val toks = split(col(textCol), " ")
    docs.select(col(idCol).as("doc_id"), toks.as("toks"))
      .select(col("doc_id"),
        posexplode(sequence(lit(0),
          greatest(size(col("toks")) - overlap - 1, lit(0)), lit(stride)))
          .as(Seq("chunk_idx", "start")),
        col("toks"))
      .select(col("doc_id"), col("chunk_idx"),
        concat_ws(" ", slice(col("toks"), col("start") + 1, lit(chunkTokens)))
          .as("chunk_text"),
        least(size(col("toks")) - col("start"), lit(chunkTokens))
          .as("n_chunk_tokens"))
  }

  /** Corpus-unigram log-probability per document: mean token
    * log P(token) under the corpus unigram distribution — the
    * simplified language-model fluency score corpus filtering uses
    * (documents full of rare tokens score low). Same determinism
    * discipline as [[bm25]]: ln through 12-decimal rounding, per-term
    * contributions decimal-rounded and summed exactly. The unigram
    * table is O(vocabulary) and broadcasts at any corpus size.
    */
  def unigramLogProb(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val tf = termFreqs(docs, textCol, idCol)
    val totals = tf.agg(sum(col("tf")).cast("double").as("n_tokens_corpus"))
    val cnt = tf.groupBy(col("term")).agg(sum(col("tf")).cast("double").as("cnt"))
    tf.join(broadcast(cnt), "term")
      .crossJoin(broadcast(totals))
      .withColumn("contrib",
        (col("tf").cast("double") * lnStable(col("cnt") / col("n_tokens_corpus")))
          .cast("decimal(20,12)"))
      .groupBy(col("doc_id"))
      .agg(sum(col("tf")).cast("bigint").as("n_tokens"),
        sum(col("contrib")).cast("decimal(38,12)").cast("double").as("sum_logprob"))
      .withColumn("mean_logprob",
        col("sum_logprob") / col("n_tokens").cast("double"))
  }

  /** Interpolated bigram log-probability per document — the next rung
    * above [[unigramLogProb]] on the fluency ladder: mean over bigram
    * positions of ln(λ·P(w₂|w₁) + (1−λ)·P(w₂)), Jelinek-Mercer
    * interpolation so unseen-bigram positions degrade to the unigram
    * prior instead of −∞. Scrambled or disfluent text scores visibly
    * lower than fluent text with the same vocabulary (which unigram
    * scoring cannot see).
    *
    * Determinism: both probabilities are single divisions of exact
    * integer counts, the λ-mix is two IEEE multiplies and an add of
    * identical operands, ln goes through 12-decimal rounding, and
    * per-position contributions are decimal-summed — bit-identical on
    * any partitioning and in the oracle's replay.
    *
    * Scale: the bigram table is O(observed bigrams) — broadcast here;
    * at web-corpus scale it outgrows a broadcast and the probe becomes
    * a shuffle equi-join on the bigram key (still never all-pairs).
    */
  /** PMI collocations: ln(P(ab) / (P(a)·P(b))) over adjacent token
    * pairs — the classic collocation detector ("strongly associated
    * word pairs"), and the association signal phrase-mining pipelines
    * threshold on. `minCount` suppresses the low-frequency PMI
    * explosion (a pair seen once always scores high).
    *
    * Same determinism discipline as [[bigramLogProb]] (exact counts,
    * single IEEE divisions, 12-decimal ln); the top-k is
    * orderBy+limit = TakeOrdered, never a global sort.
    */
  def pmiCollocations(docs: DataFrame, textCol: String,
      minCount: Long, topK: Int): DataFrame = {
    val tf = docs.select(explode(tokens(col(textCol))).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("cnt"))
    val nTok = tf.agg(sum(col("cnt")).cast("double").as("n_tokens"))
    val bi = docs.select(explode(ngramArray(tokens(col(textCol)), 2)).as("bigram"))
      .groupBy(col("bigram")).agg(count(lit(1)).as("bcnt"))
    val nBi = bi.agg(sum(col("bcnt")).cast("double").as("n_bigrams"))
    bi.filter(col("bcnt") >= minCount)
      .withColumn("w1", substring_index(col("bigram"), " ", 1))
      .withColumn("w2", substring_index(col("bigram"), " ", -1))
      .join(broadcast(tf.select(col("term").as("w1"), col("cnt").as("c1"))), "w1")
      .join(broadcast(tf.select(col("term").as("w2"), col("cnt").as("c2"))), "w2")
      .crossJoin(nTok).crossJoin(nBi)
      .withColumn("pmi", lnStable(
        (col("bcnt").cast("double") / col("n_bigrams")) /
          ((col("c1").cast("double") / col("n_tokens")) *
            (col("c2").cast("double") / col("n_tokens")))))
      .select(col("bigram"), col("bcnt").cast("bigint").as("b_count"),
        col("pmi"))
      .orderBy(col("pmi").desc, col("bigram"))
      .limit(topK)
  }

  def bigramLogProb(docs: DataFrame, textCol: String, idCol: String,
      lambda: Double = 0.7): DataFrame =
    bigramLogProbUnder(docs, docs, textCol, idCol, lambda)

  /** Pinned JM bigram model tables trained once on a model corpus —
    * the handle the streaming drivers thread through so ONE training
    * serves the fluency-cutoff derivation AND every micro-batch score
    * (r20: `fluencyCutoff` used to train the self-face LM and each
    * `applyBatch` re-trained the split-face model on the SAME
    * modelDocs — two full explode+aggregate passes over the model
    * corpus per driver run, more under multi-batch streams).
    * `uni` = (term, cnt:double), `bi` = (bigram, bcnt:double),
    * `totals` = 1-row exact-bigint-summed corpus token count as
    * double; `bcast` mirrors [[bigramLogProbUnder]]'s vocabulary
    * broadcast guard.
    */
  final case class BigramLm private[ext] (uni: DataFrame, bi: DataFrame,
    totals: DataFrame, bcast: Boolean)

  /** Train the split-face JM model tables once (pinned). Identical
    * integer counts to the tables [[bigramLogProbUnder]] derives
    * inline — `totals` re-aggregates the PINNED unigram table (sum of
    * per-term bigint counts = the exact corpus token total; the
    * inline face summed the same groups pre-pin).
    */
  def bigramLmTrain(modelDocs: DataFrame, textCol: String,
      maxBroadcastVocab: Long = 8000000L): BigramLm = {
    require(maxBroadcastVocab >= 0, "maxBroadcastVocab must be >= 0")
    val uniPin = modelDocs.select(
        explode(split(col(textCol), " ")).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("cnt0"))
      .localCheckpoint(true)
    val uni = uniPin.select(col("term"), col("cnt0").cast("double").as("cnt"))
    val totals = uniPin.agg(sum(col("cnt0")).cast("double")
      .as("n_tokens_corpus"))
    val biPin = modelDocs
      .select(explode(ngramArray(tokens(col(textCol)), 2)).as("bigram"))
      .groupBy(col("bigram")).agg(count(lit(1)).cast("double").as("bcnt"))
      .localCheckpoint(true)
    BigramLm(uni, biPin, totals, biPin.count() <= maxBroadcastVocab)
  }

  /** Score `docs` under a pre-trained pinned model ([[bigramLmTrain]])
    * — the probe side of [[bigramLogProbUnder]]'s split face, verbatim
    * (same joins, same exact-decimal contribution sum), minus the
    * per-call training.
    */
  def bigramLogProbWith(docs: DataFrame, model: BigramLm,
      textCol: String, idCol: String, lambda: Double = 0.7): DataFrame = {
    val bi = docs
      .select(col(idCol).as("doc_id"),
        explode(ngramArray(tokens(col(textCol)), 2)).as("bigram"))
      .groupBy(col("doc_id"), col("bigram"))
      .agg(count(lit(1)).as("bf"))
    def side(df: DataFrame): DataFrame =
      if (model.bcast) broadcast(df) else df
    bi
      .withColumn("w1", substring_index(col("bigram"), " ", 1))
      .withColumn("w2", substring_index(col("bigram"), " ", -1))
      .join(side(model.bi), "bigram")
      .join(side(model.uni.select(col("term").as("w1"),
        col("cnt").as("c1"))), "w1")
      .join(side(model.uni.select(col("term").as("w2"),
        col("cnt").as("c2"))), "w2")
      .crossJoin(broadcast(model.totals))
      .withColumn("contrib",
        (col("bf").cast("double") * lnStable(
          lit(lambda) * (col("bcnt") / col("c1")) +
            lit(1.0 - lambda) * (col("c2") / col("n_tokens_corpus"))))
          .cast("decimal(20,12)"))
      .groupBy(col("doc_id"))
      .agg(sum(col("bf")).cast("bigint").as("n_bigrams"),
        sum(col("contrib")).cast("decimal(38,12)").cast("double")
          .as("sum_logprob"))
      .withColumn("mean_logprob",
        col("sum_logprob") / col("n_bigrams").cast("double"))
  }

  /** Score `docs` under the interpolated bigram LM trained on
    * `modelDocs` — the CCNet reference-model split (Wenzek et al.
    * 2020: production pipelines score against a PRETRAINED LM, they
    * don't retrain per batch). With `modelDocs eq docs` this is
    * exactly the self-trained face ([[bigramLogProb]]) — same plan,
    * same values. Out-of-vocabulary restriction: bigrams whose
    * bigram/unigram statistics are absent from the model corpus are
    * EXCLUDED from the score (inner joins against the model tables),
    * so a doc's `n_bigrams` counts its in-vocabulary bigrams; for any
    * subset of the model corpus every bigram is in-vocabulary and the
    * scores are bit-identical to the one-shot run (exact decimal
    * contribution sums — partitioning can't perturb them), which is
    * what makes the streaming funnel's batch splits compose exactly
    * ([[graft.streaming.FunnelStream]]).
    *
    * Scale shape: the model tables are O(model vocabulary). On the
    * split face they are pinned once (localCheckpoint — training runs
    * a single time however many joins consume them) and broadcast
    * only while the bigram table stays within `maxBroadcastVocab`
    * rows (the [[graft.ext.Model.naiveBayesFilter]] guard, same
    * default ≈ low-hundreds of MB); a web-scale model corpus
    * auto-degrades to shuffle equi-joins — identical values (the
    * per-bigram decimal contributions commute exactly), one extra
    * doc-bigram exchange. The self face keeps the single-plan lazy
    * broadcast: its "model" IS the corpus being scored, so a guard
    * count would re-aggregate that corpus eagerly per call — there
    * the 100 TB contract is the caller persisting the tables once.
    */
  def bigramLogProbUnder(docs: DataFrame, modelDocs: DataFrame,
      textCol: String, idCol: String, lambda: Double = 0.7,
      maxBroadcastVocab: Long = 8000000L): DataFrame = {
    require(maxBroadcastVocab >= 0, "maxBroadcastVocab must be >= 0")
    // NOT doc-id-clustered (r19 negative result, recorded in
    // OPTIMIZATION_r19.md): on the self face the probe AND the model
    // statistics both read `bi`, so its (doc, bigram) exchange is
    // their shared materialization point — removing it made the
    // explode + aggregation run twice (x_quality_perplexity_buckets
    // 3.1 → 6.7 s); on the split face the streaming driver evaluates
    // the scoring chain through more than one action, so an added
    // repartition is paid per action (x_curate_stream_master
    // regressed ~2 s). The doc-clustering move lives where it
    // measured a win: tokenEntropy, contamination, the logreg feature
    // build, and the span-dedup kernels.
    if (!(modelDocs eq docs))
      // split face = train once (pinned), score (r20: one shared
      // implementation; the former inline face additionally derived
      // the 1-row corpus total from the UNPINNED unigram aggregate,
      // re-running the token explode once per consuming action)
      return bigramLogProbWith(docs,
        bigramLmTrain(modelDocs, textCol, maxBroadcastVocab),
        textCol, idCol, lambda)
    val bi = docs
      .select(col(idCol).as("doc_id"),
        explode(ngramArray(tokens(col(textCol)), 2)).as("bigram"))
      .groupBy(col("doc_id"), col("bigram"))
      .agg(count(lit(1)).as("bf"))
    // corpus unigram counts DIRECTLY (r19 optimization): the former
    // termFreqs → groupBy(term) route shuffled the full (doc, term)
    // table a second time just to throw the doc dimension away; one
    // groupBy(term) over the token stream map-side-combines straight
    // to the O(vocabulary) table, and the corpus total re-aggregates
    // THAT (vocab-sized input, reused exchange) instead of a third
    // pass over (doc, term) rows. Identical integer counts either way.
    // (cnt0 stays integral so the corpus total is an EXACT bigint sum
    // cast once — a double-typed sum would be addition-order-sensitive)
    val uniCnt = modelDocs.select(
        explode(split(col(textCol), " ")).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("cnt0"))
    val uni = uniCnt.select(col("term"), col("cnt0").cast("double").as("cnt"))
    val totals = uniCnt.agg(sum(col("cnt0")).cast("double").as("n_tokens_corpus"))
    // self-face: reuse the per-doc counts (one explode, the original
    // bigramLogProb plan), lazy broadcasts (its "model" IS the scored
    // corpus — the scaladoc's 100 TB contract)
    val biCorpus =
      bi.groupBy(col("bigram")).agg(sum(col("bf")).cast("double").as("bcnt"))
    bi
      .withColumn("w1", substring_index(col("bigram"), " ", 1))
      .withColumn("w2", substring_index(col("bigram"), " ", -1))
      .join(broadcast(biCorpus), "bigram")
      .join(broadcast(uni.select(col("term").as("w1"), col("cnt").as("c1"))), "w1")
      .join(broadcast(uni.select(col("term").as("w2"), col("cnt").as("c2"))), "w2")
      .crossJoin(broadcast(totals))
      .withColumn("contrib",
        (col("bf").cast("double") * lnStable(
          lit(lambda) * (col("bcnt") / col("c1")) +
            lit(1.0 - lambda) * (col("c2") / col("n_tokens_corpus"))))
          .cast("decimal(20,12)"))
      .groupBy(col("doc_id"))
      .agg(sum(col("bf")).cast("bigint").as("n_bigrams"),
        sum(col("contrib")).cast("decimal(38,12)").cast("double").as("sum_logprob"))
      .withColumn("mean_logprob",
        col("sum_logprob") / col("n_bigrams").cast("double"))
  }

  /** Interpolated Kneser–Ney bigram log-probability per document —
    * the smoothing CCNet's actual reference LM uses (KenLM defaults to
    * modified Kneser–Ney; Kneser & Ney 1995, Chen & Goodman 1999 —
    * public literature), the rung above [[bigramLogProb]]'s
    * Jelinek–Mercer mix: instead of backing off to RAW unigram
    * frequency, KN backs off to the CONTINUATION probability — how
    * many distinct contexts a word follows — which stops
    * high-frequency-but-context-bound words ("Francisco") from
    * inflating unseen-bigram scores.
    *
    * Per scored bigram (w₁,w₂), with corpus bigram count c, context
    * total c(w₁·) = Σ_w c(w₁,w), fan-out N₁₊(w₁·) = |{w : c(w₁,w)>0}|,
    * fan-in N₁₊(·w₂) = |{w : c(w,w₂)>0}|, and B = total distinct
    * bigram types:
    *
    *   P_KN(w₂|w₁) = max(c − d, 0)/c(w₁·)
    *               + (d·N₁₊(w₁·)/c(w₁·)) · (N₁₊(·w₂)/B)
    *
    * with absolute discount d (default 0.75, the textbook value — an
    * EXACT binary double, so the discount subtraction is exact). The
    * self-scored face means every scored bigram is observed (c ≥ 1),
    * so the max() arm never clips here; it is kept (and mirrored in
    * the oracle) because the formula is what a train/score split would
    * reuse.
    *
    * Determinism: every input to P_KN is an exact integer count cast
    * to double (counts < 2⁵³) or the exact constant d; the probability
    * is a fixed tree of IEEE divisions/multiplies/adds mirrored
    * operation-for-operation in the oracle SQL, so both engines
    * compute the identical double; ln goes through the 12-decimal
    * canonicalization and per-position contributions are
    * decimal-summed ([[bigramLogProb]]'s discipline).
    *
    * Scale shape: all four statistics tables are aggregations OF the
    * bigram-type table (O(bigram types), map-side combinable) — the
    * fan-out/context totals fold into ONE groupBy(w₁) pass and the
    * fan-in into one groupBy(w₂) pass; they broadcast at this corpus
    * scale (the [[bigramLogProb]] self-face contract: at web scale the
    * caller persists the tables once and the probes degrade to
    * shuffle equi-joins, never all-pairs).
    */
  def bigramKneserNey(docs: DataFrame, textCol: String, idCol: String,
      discount: Double = 0.75): DataFrame =
    bigramKneserNeyUnder(docs, docs, textCol, idCol, discount)

  /** Score `docs` under the Kneser–Ney bigram LM trained on
    * `modelDocs` — the CCNet pretrained-reference-model split
    * ([[bigramLogProbUnder]]'s shape). This is where KN's backoff arm
    * actually FIRES: a scored bigram ABSENT from the model corpus
    * (c = 0, the max() clips the first term to zero) scores purely on
    * the continuation product — the smoothing's point, which the
    * self-trained face never exercises (every self-scored bigram is
    * observed).
    *
    * OOV restriction (weaker than [[bigramLogProbUnder]]'s, by
    * design): a scored bigram needs only its CONTEXT w₁ (as a bigram
    * opener) and its TARGET w₂ (as a bigram closer) in the model —
    * the bigram itself may be unseen (LEFT join, count 0). Bigrams
    * failing either unigram-level condition are excluded (inner
    * joins), and `n_bigrams` counts the scoreable ones.
    *
    * With `modelDocs eq docs` the LEFT join is total and this is
    * exactly the self face — same plan shape, same values.
    *
    * Scale/broadcast: self face keeps the lazy broadcast (its model IS
    * the corpus — the [[bigramLogProbUnder]] self-face contract);
    * the split face pins the three model tables once
    * (localCheckpoint) and broadcasts only within `maxBroadcastVocab`
    * bigram types, auto-degrading to shuffle equi-joins — identical
    * values (exact-decimal contribution sums commute).
    */
  def bigramKneserNeyUnder(docs: DataFrame, modelDocs: DataFrame,
      textCol: String, idCol: String, discount: Double = 0.75,
      maxBroadcastVocab: Long = 8000000L): DataFrame = {
    require(discount > 0.0 && discount <= 1.0,
      "discount must be in (0, 1]")
    require(maxBroadcastVocab >= 0, "maxBroadcastVocab must be >= 0")
    val selfFace = modelDocs eq docs
    // NOT doc-id-clustered — the shared-materialization-point /
    // multi-action argument on [[bigramLogProbUnder]] (r19)
    val bi = docs
      .select(col(idCol).as("doc_id"),
        explode(ngramArray(tokens(col(textCol)), 2)).as("bigram"))
      .groupBy(col("doc_id"), col("bigram"))
      .agg(count(lit(1)).as("bf"))
    val bicRaw = (if (selfFace)
        bi.groupBy(col("bigram")).agg(sum(col("bf")).cast("bigint").as("bcnt"))
      else modelDocs
        .select(explode(ngramArray(tokens(col(textCol)), 2)).as("bigram"))
        .groupBy(col("bigram")).agg(count(lit(1)).cast("bigint").as("bcnt")))
      .withColumn("w1", substring_index(col("bigram"), " ", 1))
      .withColumn("w2", substring_index(col("bigram"), " ", -1))
    val bic = if (selfFace) bicRaw else bicRaw.localCheckpoint(true)
    // context totals + fan-out in ONE pass over the type table
    val ctxRaw = bic.groupBy(col("w1"))
      .agg(sum(col("bcnt")).cast("double").as("ctot"),
        count(lit(1)).cast("double").as("n1_fwd"))
    val contRaw = bic.groupBy(col("w2"))
      .agg(count(lit(1)).cast("double").as("n1_bwd"))
    val (ctx, cont, bcast) =
      if (selfFace) (ctxRaw, contRaw, true)
      else (ctxRaw.localCheckpoint(true), contRaw.localCheckpoint(true),
        bic.count() <= maxBroadcastVocab)
    def side(df: DataFrame): DataFrame = if (bcast) broadcast(df) else df
    val nbt = bic.agg(count(lit(1)).cast("double").as("n_bigram_types"))
    bi
      .withColumn("w1", substring_index(col("bigram"), " ", 1))
      .withColumn("w2", substring_index(col("bigram"), " ", -1))
      .join(side(bic.select(col("bigram"), col("bcnt"))), Seq("bigram"), "left")
      .join(side(ctx), "w1")
      .join(side(cont), "w2")
      .crossJoin(broadcast(nbt))
      .withColumn("contrib",
        (col("bf").cast("double") * lnStable(
          greatest(coalesce(col("bcnt"), lit(0L)).cast("double") -
            lit(discount), lit(0.0)) / col("ctot") +
            (lit(discount) * col("n1_fwd") / col("ctot")) *
              (col("n1_bwd") / col("n_bigram_types"))))
          .cast("decimal(20,12)"))
      .groupBy(col("doc_id"))
      .agg(sum(col("bf")).cast("bigint").as("n_bigrams"),
        sum(col("contrib")).cast("decimal(38,12)").cast("double").as("sum_logprob"))
      .withColumn("mean_logprob",
        col("sum_logprob") / col("n_bigrams").cast("double"))
  }

  /** Degenerate-repetition loop tagger — the "model stuck in a loop"
    * detector (repetition is the signature failure mode of neural
    * text generation — Holtzman et al. 2020 — and Dolma-class
    * pipelines tag repeated-tail documents; public literature). Per
    * document, over whitespace tokens w (n = |w|):
    *
    *  - `min_period`: the smallest p ≤ maxPeriod with p < n and
    *    w[1..n−p] = w[p+1..n] — FULL-text periodicity (the whole doc
    *    is one repeating block); NULL when none.
    *  - `tail_period`: the smallest p ≤ maxPeriod with 2p ≤ n whose
    *    last two p-blocks are equal — the trailing generation loop;
    *    NULL when none.
    *  - `tail_repeats`: for that p, how many consecutive trailing
    *    p-blocks equal the last one (incl. itself), capped at
    *    `maxRepeats` — the loop length the tagger thresholds on.
    *
    * Pure per-row array-slice comparisons — narrow, codegen'd,
    * shuffle-free, and replayed in SQL as list-slice equality (both
    * engines compare lists elementwise). The when-cascades test
    * smaller periods/counts first, so the emitted values are the
    * minima/maxima they claim to be.
    */
  def repetitionLoop(docs: DataFrame, textCol: String, idCol: String,
      maxPeriod: Int = 4, maxRepeats: Int = 8): DataFrame = {
    require(maxPeriod >= 1, "maxPeriod must be >= 1")
    require(maxRepeats >= 2, "maxRepeats must be >= 2")
    val w = tokens(col(textCol))
    val n = size(w)
    // every slice is TOTAL (starts clamped to 1, lengths to >= 0) so
    // the guards stay pure boolean logic — no reliance on && skipping
    // an out-of-range slice
    def seg(start: Column, len: Column): Column =
      slice(w, greatest(start, lit(1)), greatest(len, lit(0)))
    def fullPeriodic(p: Int): Column =
      (n > p) && (seg(lit(1), n - p) === seg(lit(p + 1), n - p))
    def lastBlock(p: Int): Column = seg(n - (p - 1), lit(p))
    // the k-th p-block from the end (k = 1 is the one BEFORE the last)
    def blockMatches(k: Int, p: Int): Column =
      (n >= (k + 1) * p) &&
        (seg(n - ((k + 1) * p - 1), lit(p)) === lastBlock(p))
    val minPeriod = (1 to maxPeriod)
      .foldLeft(when(lit(false), 1)) { (acc, p) =>
        acc.when(fullPeriodic(p), p)
      }.otherwise(lit(null)).cast("int")
    val tailPeriod = (1 to maxPeriod)
      .foldLeft(when(lit(false), 1)) { (acc, p) =>
        acc.when(blockMatches(1, p), p)
      }.otherwise(lit(null)).cast("int")
    def repeatsFor(p: Int): Column = (1 until maxRepeats)
      .foldLeft(when(lit(false), 1)) { (acc, k) =>
        acc.when(!blockMatches(k, p), k)
      }.otherwise(lit(maxRepeats)).cast("int")
    val tailRepeats = (1 to maxPeriod)
      .foldLeft(when(lit(false), 1)) { (acc, p) =>
        acc.when(tailPeriod === p, repeatsFor(p))
      }.otherwise(lit(null)).cast("int")
    docs.select(col(idCol).as("doc_id"), n.cast("bigint").as("n_words"),
      minPeriod.as("min_period"), tailPeriod.as("tail_period"),
      tailRepeats.as("tail_repeats"))
  }

  /** CCNet-style contrastive domain selection (Wenzek et al. 2020;
    * Moore–Lewis 2010 cross-entropy difference — public literature):
    * every scoreable document is scored under TWO interpolated bigram
    * LMs — the GENERAL model (trained on the full corpus) and an
    * IN-DOMAIN model (trained on `domainDocs`) — and selected when its
    * per-bigram log-prob advantage `delta = lp_domain − lp_general`
    * exceeds `minDelta`. This is the actual selection signal
    * domain-targeted curation runs: "keep what the in-domain LM finds
    * more fluent than the general LM does".
    *
    * OOV restriction (documented on [[bigramLogProbUnder]]): a doc
    * whose bigrams never hit the domain model's vocabulary has no
    * domain score — `lp_domain`/`delta` are NULL and the doc is NOT
    * selected (the conservative direction). Note the vocabulary
    * ASYMMETRY this implies: `lp_domain` averages over the doc's
    * domain-vocab bigrams only while `lp_general` averages over all of
    * them, which biases `delta` upward for docs with rare bigrams —
    * calibrate `minDelta` under the restriction (the emitted
    * `n_bigrams` / `n_bigrams_domain` pair quantifies it per doc)
    * rather than treating 0.0 as a neutral point.
    * Determinism: both scores are the exact-decimal contribution sums
    * divided once; the delta is one double subtraction of identical
    * operands on both engines.
    *
    * Scale shape: two broadcast-model scoring passes over the same
    * token stream ([[bigramLogProbUnder]]'s shape — the model tables
    * are O(vocabulary)); one equi-join on doc id. Nothing iterative.
    */
  def domainLmSelect(docs: DataFrame, domainDocs: DataFrame,
      textCol: String, idCol: String, minDelta: Double = 0.0,
      lambda: Double = 0.7): DataFrame = {
    val gen = bigramLogProb(docs, textCol, idCol, lambda)
      .select(col("doc_id"), col("n_bigrams"),
        col("mean_logprob").as("lp_general"))
    val dom = bigramLogProbUnder(docs, domainDocs, textCol, idCol, lambda)
      .select(col("doc_id"),
        col("n_bigrams").as("n_bigrams_domain"),
        col("mean_logprob").as("lp_domain"))
    gen.join(dom, Seq("doc_id"), "left")
      .withColumn("delta", col("lp_domain") - col("lp_general"))
      .withColumn("selected",
        coalesce(col("delta") > minDelta, lit(false)))
  }

  /** CCNet-style perplexity bucketing (Wenzek et al. 2020, public
    * literature — the standard head/middle/tail corpus-quality split):
    * every scoreable document is ranked by its interpolated-bigram-LM
    * mean log-prob ([[bigramLogProb]]; most fluent first, ties by id)
    * and the ranked corpus is cut into `nBuckets` equal-size groups —
    * bucket = floor((rank−1)·nBuckets / N), exact integer arithmetic
    * on both engines. Bucket 0 is the "head" a curation pipeline
    * up-samples; the last bucket is the "tail" it drops or down-weights.
    * Documents with fewer than 2 tokens have no bigrams, are not
    * scoreable, and are excluded (the oracle's bigram CTE excludes
    * them identically).
    *
    * Scale shape: the LM scoring inherits [[bigramLogProb]]'s joins;
    * the ranking is [[graft.ext.Rank.globalRowNumber]] — a
    * range-partitioned exchange, NEVER a single-partition global
    * window — and the bucket cut is an O(1) broadcast of the corpus
    * count. Returns (doc_id, n_bigrams, mean_logprob, rn, bucket).
    */
  def perplexityBuckets(docs: DataFrame, textCol: String, idCol: String,
      nBuckets: Int = 3, lambda: Double = 0.7): DataFrame =
    rankBuckets(bigramLogProb(docs, textCol, idCol, lambda), nBuckets)

  /** [[perplexityBuckets]] with the Kneser–Ney LM ([[bigramKneserNey]])
    * as the scorer — CCNet's actual reference models are KN-smoothed
    * (Wenzek et al. 2020 score under KenLM, which is modified KN —
    * public literature), so this is the fluency-cut face a faithful
    * CCNet reproduction runs; the interpolated-JM face stays as the
    * cheaper twin. Identical rank/cut semantics, only the score
    * changes; `x_quality_ppl_bucket_agreement` measures how often the
    * two LMs bucket a document identically.
    */
  def perplexityBucketsKn(docs: DataFrame, textCol: String, idCol: String,
      nBuckets: Int = 3, discount: Double = 0.75): DataFrame =
    rankBuckets(bigramKneserNey(docs, textCol, idCol, discount), nBuckets)

  /** [[perplexityBuckets]] scored under a pre-trained pinned model
    * ([[bigramLmTrain]]) — for a corpus that IS the model corpus the
    * buckets are bit-identical to the self-trained face (every bigram
    * is in-vocabulary, the counts are the same integers, the
    * contribution tree is the same IEEE expression), which is what
    * lets the streaming fluency cutoff share one training with the
    * batch scorer (r20).
    */
  def perplexityBucketsWith(docs: DataFrame, model: BigramLm,
      textCol: String, idCol: String, nBuckets: Int = 3,
      lambda: Double = 0.7): DataFrame =
    rankBuckets(bigramLogProbWith(docs, model, textCol, idCol, lambda),
      nBuckets)

  /** Shared CCNet bucket cut: rank by (mean_logprob DESC, doc_id),
    * bucket = floor((rank−1)·nBuckets / N) in exact integer arithmetic.
    */
  private def rankBuckets(scored: DataFrame, nBuckets: Int): DataFrame = {
    require(nBuckets > 0, "nBuckets must be positive")
    val lp = scored.select(col("doc_id"), col("n_bigrams"),
      col("mean_logprob"))
    // N comes from the rank's own per-partition prefix sums — a
    // separate lp.count() would re-execute the whole LM scoring chain
    // a second time just for one long
    val (ranked, n) = graft.ext.Rank.globalRowNumberWithTotal(lp,
      Seq(col("mean_logprob").desc, col("doc_id").asc))
    ranked.withColumn("bucket",
      expr(s"CAST(((rn - 1) * $nBuckets) div ${n}L AS INT)"))
  }

  /** Word n-grams of a token array as a (possibly empty) string array:
    * ["a b", "b c", ...]. Guarded so short documents yield [] rather
    * than a descending `sequence` blowup. Narrow, codegen'd.
    */
  def ngramArray(toks: Column, n: Int): Column =
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n)))))

  /** Gopher-style repetition signals (Rae et al. 2021 — public
    * literature): per document, the fraction of n-gram occurrences
    * taken by the single most frequent n-gram (`top_gram_frac`) and
    * the fraction that are repeats of an earlier occurrence
    * (`dup_gram_frac` = 1 − distinct/total). Heavily repetitive docs
    * (boilerplate, keyword stuffing, degenerate generations) score
    * high on both and get filtered before training.
    *
    * Shape: the signals are a pure function of one document, so this
    * is a NARROW per-row pass over the codegen'd `gram_stats`
    * expression ([[graft.plans.GramStats]]) — zero shuffles, O(doc)
    * work and O(doc vocabulary) transient memory per row. The
    * relational formulation ([[repetitionSignalsShuffled]]) would
    * shuffle every n-gram occurrence of the corpus. All fractions are
    * single IEEE divisions of exact integer counts, hence bit-identical
    * across engines.
    */
  def repetitionSignals(docs: DataFrame, textCol: String, idCol: String,
      n: Int = 2): DataFrame = {
    graft.plans.GraftExtensions.ensure(docs.sparkSession)
    docs.select(col(idCol).as("doc_id"),
        call_function("gram_stats", tokens(col(textCol)), lit(n)).as("gs"))
      .select(col("doc_id"), col("gs.n_grams").as("n_grams"),
        col("gs.distinct_grams").as("distinct_grams"),
        col("gs.top_count").as("top_count"))
      .filter(col("n_grams") > 0)
      .withColumn("top_gram_frac",
        col("top_count").cast("double") / col("n_grams").cast("double"))
      .withColumn("dup_gram_frac",
        lit(1.0) - col("distinct_grams").cast("double") / col("n_grams").cast("double"))
  }

  /** Relational formulation of [[repetitionSignals]] — explode → one
    * shuffle on (doc, gram) → per-doc rollup, [[termFreqs]]-shaped.
    * Kept as the reference semantics the parity spec checks the native
    * expression against (same role [[graft.ext.Similarity.dotHof]]
    * plays for vec_dot).
    */
  def repetitionSignalsShuffled(docs: DataFrame, textCol: String, idCol: String,
      n: Int = 2): DataFrame = {
    val grams = docs.select(col(idCol).as("doc_id"),
      explode(ngramArray(tokens(col(textCol)), n)).as("gram"))
    grams.groupBy(col("doc_id"), col("gram"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).cast("bigint").as("n_grams"),
        count(lit(1)).cast("bigint").as("distinct_grams"),
        max(col("c")).cast("bigint").as("top_count"))
      .withColumn("top_gram_frac",
        col("top_count").cast("double") / col("n_grams").cast("double"))
      .withColumn("dup_gram_frac",
        lit(1.0) - col("distinct_grams").cast("double") / col("n_grams").cast("double"))
  }

  /** PII patterns, written to the common subset of Java regex (Spark)
    * and RE2 (DuckDB oracle): explicit character classes, no
    * backreferences or lookaround.
    */
  val piiEmailRe = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
  val piiPhoneRe = "[0-9]{3}-[0-9]{3}-[0-9]{4}"
  val piiIpv4Re = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"

  def piiEmailCount(text: Column): Column = regexp_count(text, lit(piiEmailRe))
  def piiPhoneCount(text: Column): Column = regexp_count(text, lit(piiPhoneRe))
  def piiIpv4Count(text: Column): Column = regexp_count(text, lit(piiIpv4Re))

  /** PII wave 2 — checksum-validated identifiers. Candidate payment
    * card numbers (16 digits, word-bounded) are validated by the Luhn
    * mod-10 check (ISO/IEC 7812 — public standard); candidate IBANs
    * (2 uppercase letters + 2 check digits + digit-only BBAN) by the
    * ISO 13616 mod-97 test. The checksum kills the false-positive
    * class regex-only PII scanning suffers — an arbitrary 16-digit run
    * is only flagged when its check math works out (~1 in 10 random
    * runs pass Luhn; ~1 in 97 pass mod-97).
    *
    * Both checks are pure integer arithmetic over the candidate's
    * characters: Luhn doubles every second digit (positions 1,3,…,15
    * left-to-right on a 16-digit candidate, i.e. every second from the
    * right excluding the check digit) and sums mod 10; the IBAN check
    * folds (acc·10 + digit) mod 97 over the rearranged digit sequence
    * — BBAN digits, the two country letters expanded to 10–35, then
    * the check digits — so acc < 97 keeps every intermediate < 1018
    * and no big-integer type is ever needed. Narrow, zero-shuffle,
    * codegen'd, SQL-replayable on both engines.
    */
  val piiCardRe = "\\b[0-9]{16}\\b"
  val piiIbanRe = "\\b[A-Z]{2}[0-9]{13,32}\\b"

  /** Luhn mod-10 validity of a 16-digit candidate string. */
  def luhnValid(c: Column): Column = {
    val total = aggregate(
      transform(sequence(lit(1), lit(16)), i => {
        val d = ascii(c.substr(i, lit(1))) - lit(48)
        val doubled = d * 2 - when(d > 4, lit(9)).otherwise(lit(0))
        when(i % 2 === 1, doubled).otherwise(d)
      }),
      lit(0), (acc, x) => acc + x)
    total % 10 === 0
  }

  /** ISO 13616 mod-97 validity of an IBAN candidate with digit-only
    * BBAN (the [[piiIbanRe]] shape).
    */
  def ibanValid(c: Column): Column = {
    def letter(i: Int) = ascii(c.substr(lit(i), lit(1))) - lit(55)
    def digit(i: Int) = (ascii(c.substr(lit(i), lit(1))) - lit(48)).cast("long")
    val bban = transform(sequence(lit(5), length(c)),
      i => (ascii(c.substr(i, lit(1))) - lit(48)).cast("long"))
    val tail = array(
      floor(letter(1) / 10).cast("long"), (letter(1) % 10).cast("long"),
      floor(letter(2) / 10).cast("long"), (letter(2) % 10).cast("long"),
      digit(3), digit(4))
    aggregate(concat(bban, tail), lit(0L),
      (acc, d) => (acc * 10L + d) % 97L) === 1L
  }

  /** Per-doc checksum-validated PII report: candidate and valid counts
    * for both identifier classes, the composite flag, and the text with
    * every VALIDATED identifier redacted in place (invalid candidates
    * are left alone — they are not PII, and mangling them is the
    * regex-only failure mode this pass exists to fix).
    */
  def piiChecksums(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs
      .withColumn("_cards",
        regexp_extract_all(col(textCol), lit(piiCardRe), lit(0)))
      .withColumn("_ibans",
        regexp_extract_all(col(textCol), lit(piiIbanRe), lit(0)))
      .withColumn("_vcards", filter(col("_cards"), c => luhnValid(c)))
      .withColumn("_vibans", filter(col("_ibans"), c => ibanValid(c)))
      .select(col(idCol).as("doc_id"),
        size(col("_cards")).cast("bigint").as("n_card_candidates"),
        size(col("_vcards")).cast("bigint").as("n_card_valid"),
        size(col("_ibans")).cast("bigint").as("n_iban_candidates"),
        size(col("_vibans")).cast("bigint").as("n_iban_valid"),
        (size(col("_vcards")) > 0 || size(col("_vibans")) > 0)
          .as("has_valid_pii"),
        // boundary-aware redaction (r13 advice): a validated PAN can
        // also occur INSIDE a longer digit run that the word-bounded
        // candidate regex correctly rejected — plain substring replace
        // would mangle it ('4111…1111' inside '4111…11112222' →
        // '<PAN>2222'). \b-anchor the validated value instead; the
        // candidates are [0-9A-Z]-only, so interpolating them into a
        // pattern is metacharacter-safe.
        aggregate(col("_vibans"),
          aggregate(col("_vcards"), col(textCol),
            (acc, x) => regexp_replace(acc,
              concat(lit("\\b"), x, lit("\\b")), lit("<PAN>"))),
          (acc, x) => regexp_replace(acc,
            concat(lit("\\b"), x, lit("\\b")), lit("<IBAN>")))
          .as("redacted_text"))

  /** Redact PII in place with typed placeholders. Email first (its
    * local part may contain digit runs a later pass would mangle),
    * then IPv4 (dots) before phone (dashes) — the two are disjoint,
    * but a fixed order keeps the output deterministic by construction.
    * Pure per-row regexp_replace chain: narrow, no shuffle.
    */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, piiEmailRe, "<EMAIL>"),
        piiIpv4Re, "<IP>"),
      piiPhoneRe, "<PHONE>")

  /** Benchmark decontamination (n-gram overlap, as used for public
    * eval-suite filtering): for each corpus document, how many of its
    * DISTINCT word n-grams also appear anywhere in the eval set.
    * Returns (doc_id, n_grams, n_hit, hit_frac, contaminated).
    *
    * Scale shape: the eval side is a benchmark suite — tiny relative
    * to a 100 TB corpus — so its distinct-gram set is broadcast and
    * the probe is a broadcast-hash left join on the gram string; the
    * corpus side never shuffles for the join (only the per-doc
    * distinct + rollup shuffle on doc_id). `hashedGrams` is the scale
    * path: each gram is reduced to the rolling polynomial fingerprint
    * (~4× smaller broadcast and probe keys than 5-word strings) — the
    * hash is SQL-replayable so the variant stays oracle-adjudicable,
    * and a hash collision can only add a (vanishingly rare) false
    * contamination flag, the conservative direction for filtering.
    */
  def contamination(corpus: DataFrame, evalSet: DataFrame,
      textCol: String, idCol: String, n: Int = 5,
      hashedGrams: Boolean = false): DataFrame = {
    def grams(d: DataFrame) = {
      val g = d.select(col(idCol).as("doc_id"),
        explode(ngramArray(tokens(col(textCol)), n)).as("gram"))
      (if (hashedGrams) g.select(col("doc_id"), fingerprint(col("gram")).as("gram"))
       else g).distinct()
    }
    val evalGrams = grams(evalSet).select(col("gram")).distinct()
      .withColumn("_hit", lit(1))
    // shuffle the DOCS, not the explode (r19, the bigramLogProbUnder
    // move): doc-id clustering before the gram explode makes both the
    // per-doc gram distinct AND the per-doc hit aggregation
    // partition-local — one raw-docs exchange instead of two
    // gram-row exchanges
    val corpusGrams = corpus.repartition(col(idCol))
      .select(col(idCol).as("doc_id"),
        explode(ngramArray(tokens(col(textCol)), n)).as("gram"))
    (if (hashedGrams)
        corpusGrams.select(col("doc_id"), fingerprint(col("gram")).as("gram"))
      else corpusGrams).distinct()
      .join(broadcast(evalGrams), Seq("gram"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("bigint").as("n_grams"),
        sum(coalesce(col("_hit"), lit(0))).cast("bigint").as("n_hit"))
      .withColumn("hit_frac",
        col("n_hit").cast("double") / col("n_grams").cast("double"))
      .withColumn("contaminated", col("n_hit") > 0)
  }

  /** Distinct n-grams of a (small) eval set, collected to the driver.
    * The eval suite is bounded by definition — it's the benchmark
    * collection, not the corpus — so O(eval grams) on the driver is the
    * same budget [[contamination]] already spends broadcasting it.
    */
  def evalGramSet(evalSet: DataFrame, textCol: String, n: Int): Array[String] =
    evalSet.select(explode(ngramArray(tokens(col(textCol)), n)).as("gram"))
      .distinct().collect().map(_.getString(0))

  /** Narrow decontamination flag: does `text` share any n-gram with the
    * (plan-embedded) eval-gram set? Unlike [[contamination]] — which
    * explodes corpus grams, distincts them (a corpus-gram shuffle), and
    * joins — this is a zero-shuffle per-row membership probe via the
    * native short-circuiting [[graft.plans.GramOverlap]] expression
    * (hash-set probe per gram; the composable
    * `arrays_overlap(ngramArray(...), lit(...))` form scans the eval
    * array pairwise — measured 1.7s vs ~0.2s at sf0.1). The corpus
    * never moves; each row does O(doc grams) expected work. Use when
    * only the boolean verdict is needed (e.g. pipeline filters); use
    * [[contamination]] when the per-doc hit counts/fractions are the
    * product.
    */
  def contaminatedNarrow(text: Column, evalGrams: Array[String],
      n: Int): Column =
    call_function("gram_overlap", tokens(text), lit(n),
      typedLit(evalGrams.toSeq))

  /** Narrow top-gram-frac column (same signal as [[repetitionSignals]]'
    * `top_gram_frac`, as a single expression): 0.0 for docs too short
    * to have any n-gram — matching the left-join + coalesce(0.0) idiom
    * pipelines used with the DataFrame form.
    */
  def topGramFrac(text: Column, n: Int = 2): Column = {
    val gs = call_function("gram_stats", tokens(text), lit(n))
    when(gs.getField("n_grams") > 0,
      gs.getField("top_count").cast("double") /
        gs.getField("n_grams").cast("double"))
      .otherwise(lit(0.0))
  }

  /** Rolling polynomial fingerprint over the word sequence
    * (order-sensitive): fp = fold((acc*1000003 + h(w)) mod (2^31-1));
    * h(w) = len*961 + 31*code(first) + code(last). Word hash is kept
    * simple so the oracle can recompute it in SQL; all intermediates
    * stay < 2^62 (no Long overflow).
    */
  def fingerprint(text: Column): Column =
    aggregate(transform(tokens(text), wordHash(_)), lit(0L),
      (acc, x) => (acc * lit(1000003L) + x) % lit(2147483647L))

  /** The SQL-replayable word hash shared by [[fingerprint]] and the
    * winnowing scheme: len·961 + 31·code(first) + code(last).
    */
  private def wordHash(w: Column): Column =
    (length(w) * lit(961) + ascii(w) * lit(31) +
      ascii(w.substr(lit(-1), lit(1)))).cast("long")

  /** Winnowing fingerprint selection (Schleimer/Wilkerson/Aiken,
    * SIGMOD'03 — the MOSS scheme, standard for code/document dedup in
    * training corpora): hash every k-token gram, slide a w-gram window,
    * keep each window's MINIMUM hash; the distinct minima are the
    * document's fingerprint set. Guarantees: any shared run of
    * k + w − 1 tokens between two documents yields at least one shared
    * print, while storing only ~2/(w+1) of the gram hashes.
    *
    * Selection is at value level (distinct window minima) — tie
    * position rules (MOSS keeps the rightmost) affect which POSITION
    * is recorded, not which values, so the value set is rule-free and
    * engine-independent. Narrow per-row evaluation; the gram hash is
    * the rolling fingerprint restricted to the gram, so every step
    * replays in SQL. Fewer grams than w → one window over all grams
    * (the guarantee's boundary case); fewer tokens than k → empty.
    */
  // the three shared winnow expression builders — ONE definition of
  // the hash/window/guard scheme, composed by both the single-Column
  // reference form and the staged query form so they can never drift.
  // sequence bounds clamped to ≥1 so the expressions stay valid even
  // when a branch's result is discarded by the guards (CSE may
  // evaluate subtrees eagerly; sequence(1, n<1) would count DOWN and
  // slice would reject its positions)
  private def winnowGramHashes(hs: Column, k: Int): Column =
    transform(
      sequence(lit(1), greatest(size(hs) - (k - 1), lit(1))),
      i => aggregate(slice(hs, i, lit(k)), lit(0L),
        (acc, x) => (acc * lit(1000003L) + x) % lit(2147483647L)))

  private def winnowMins(hs: Column, gramHashes: Column, k: Int,
      w: Int): Column = {
    val windows = transform(
      sequence(lit(1), greatest(size(gramHashes) - (w - 1), lit(1))),
      i => array_min(slice(gramHashes, i, lit(w))))
    val mins = when(size(hs) < k, array().cast("array<bigint>"))
      .otherwise(when(size(gramHashes) < w, array(array_min(gramHashes)))
        .otherwise(windows))
    array_sort(array_distinct(mins))
  }

  def winnowPrints(text: Column, k: Int, w: Int): Column = {
    require(k > 0 && w > 0, "need k > 0 and w > 0")
    val hs = transform(tokens(text), wordHash(_))
    winnowMins(hs, winnowGramHashes(hs, k), k, w)
  }

  /** [[winnowPrints]] with the intermediate arrays STAGED as real
    * columns — the form every query should use. The single-Column
    * formulation above embeds `gramHashes` (itself re-evaluating `hs`
    * per gram) inside every window lambda: array subexpressions
    * referenced inside a higher-order function are re-evaluated on
    * every lambda invocation (no CSE inside lambda bodies), so its
    * per-doc cost is O(n_windows × n_grams × n_tokens) — measured
    * 80 s for 500×54-token docs at sf0.01, i.e. the tree, not the
    * algorithm. Staging each array as a column evaluates it once per
    * row (CollapseProject keeps multi-referenced non-cheap projections
    * apart), restoring the algorithm's O(n·(k+w)): measured ~1 s on
    * the same input. Output is identical — WinnowSpec asserts parity
    * with the single-Column reference on every fixture.
    */
  def withWinnowPrints(df: DataFrame, textCol: String, out: String,
      k: Int, w: Int): DataFrame = {
    require(k > 0 && w > 0, "need k > 0 and w > 0")
    val hsC = s"_winnow_hs_$out"
    val ghC = s"_winnow_gh_$out"
    df.withColumn(hsC, transform(tokens(col(textCol)), wordHash(_)))
      .withColumn(ghC, winnowGramHashes(col(hsC), k))
      .withColumn(out, winnowMins(col(hsC), col(ghC), k, w))
      .drop(hsC, ghC)
  }

  /** Top-`topN` vocabulary with dense frequency-ranked ids (ties broken
    * by token, so ids are stable across runs and partitionings). The
    * count is the classic map-side-combined wordcount; top-N is a
    * TakeOrdered (never a global sort materialization), and the id
    * ranking runs on the topN survivors only.
    */
  def buildVocab(docs: DataFrame, textCol: String, topN: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // constant single partition on purpose: topN rows at this point
    // (pmod, not lit(0) — a literal partition key gets constant-folded
    // to an empty spec and logs global-window warnings)
    val w = Window.partitionBy(pmod(length(col("token")), lit(1)))
      .orderBy(col("cnt").desc, col("token"))
    docs.select(explode(tokens(col(textCol))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).cast("bigint").as("cnt"))
      .orderBy(col("cnt").desc, col("token")).limit(topN)
      .withColumn("tid", (row_number().over(w) - 1).cast("int"))
      .select(col("tid"), col("token"), col("cnt"))
  }

  /** Per-document vocabulary coverage / OOV accounting against a
    * (small, broadcast) vocabulary: token stream left-joins the vocab,
    * then one aggregate per document. At web scale the vocab is the
    * only state shipped to executors; the corpus shuffles once on the
    * document id.
    */
  def vocabCoverage(docs: DataFrame, textCol: String, idCol: String,
      vocab: DataFrame): DataFrame =
    docs.select(col(idCol), explode(tokens(col(textCol))).as("token"))
      .join(broadcast(vocab.select(col("token"), col("tid"))),
        Seq("token"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).cast("bigint").as("n_tokens"),
        count(col("tid")).cast("bigint").as("n_in_vocab"),
        count_distinct(when(col("tid").isNull, col("token")))
          .as("n_distinct_oov"),
        (count(col("tid")).cast("double") / count(lit(1))).as("coverage"))

  /** Zipf's-law fit over the corpus rank–frequency curve: ordinary
    * least squares of ln(freq) on ln(rank) for the top `topR` terms —
    * the slope (healthy natural-language corpora sit near −1) is the
    * classic one-number diagnostic for boilerplate-flooded or
    * synthetic-heavy corpora (a drifted slope means the token
    * distribution no longer looks like language).
    *
    * Determinism recipe: each ln is canonicalized through
    * DECIMAL(20,12) (absorbs the last-ulp libm differences between
    * engines); OLS cross-products are products of those canonical
    * doubles rounded to DECIMAL(30,14) and SUMMED EXACTLY, so the
    * closed-form slope/intercept divide identical operands in both
    * engines. One row out.
    *
    * Scale shape: one token-count aggregate (map-side combinable), a
    * topR TakeOrdered (never a global sort), and an O(topR) final
    * aggregate.
    */
  def zipfFit(docs: DataFrame, textCol: String, topR: Int): DataFrame = {
    val freq = docs
      .select(explode(tokens(col(textCol))).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy(col("term")).agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("term")).limit(topR)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("freq").desc, col("term")) // topR rows — tiny window
    val pts = freq
      .withColumn("r", row_number().over(w))
      .select(
        log(col("r").cast("double")).cast("decimal(20,12)").cast("double")
          .as("lx"),
        log(col("freq").cast("double")).cast("decimal(20,12)").cast("double")
          .as("ly"))
    val sums = pts.agg(
      count(lit(1)).cast("bigint").as("n"),
      sum(col("lx").cast("decimal(30,14)")).as("sx"),
      sum(col("ly").cast("decimal(30,14)")).as("sy"),
      sum((col("lx") * col("lx")).cast("decimal(30,14)")).as("sxx"),
      sum((col("lx") * col("ly")).cast("decimal(30,14)")).as("sxy"))
    sums.select(col("n"),
      ((col("n") * col("sxy").cast("double") -
        col("sx").cast("double") * col("sy").cast("double")) /
        (col("n") * col("sxx").cast("double") -
          col("sx").cast("double") * col("sx").cast("double")))
        .cast("decimal(20,12)").cast("double").as("zipf_slope"),
      ((col("sy").cast("double") -
        ((col("n") * col("sxy").cast("double") -
          col("sx").cast("double") * col("sy").cast("double")) /
          (col("n") * col("sxx").cast("double") -
            col("sx").cast("double") * col("sx").cast("double"))) *
          col("sx").cast("double")) / col("n"))
        .cast("decimal(20,12)").cast("double").as("zipf_intercept"))
  }

  /** Per-document Shannon entropy of the token distribution (nats) —
    * the information-density quality signal: boilerplate and
    * keyword-stuffed docs score low, natural prose high. Computed as
    * `ln(n) − (Σ c·ln c)/n` over per-doc token counts so only counts
    * (integers) ever enter a logarithm.
    *
    * Determinism recipe (the [[zipfFit]] one): each ln is canonicalized
    * through DECIMAL(20,12); the c·ln c products are rounded to
    * DECIMAL(30,14) and summed exactly; the final expression is plain
    * double arithmetic on identical operands, re-canonicalized once.
    *
    * Scale shape: one (doc, token) count aggregate (map-side
    * combinable) and one per-doc aggregate — both exchanges are keyed
    * by doc id, so the second collapses into the first's partitioning.
    */
  /** The quality-signals TABLE — the RedPajama-V2 artifact shape
    * (Weber et al. 2024, "RedPajama: an Open Dataset for Training
    * Large Language Models" — the V2 release ships a per-document
    * quality_signals parquet beside the text so downstream users
    * filter without recomputing): ONE wide row per document bundling
    * the engine's audited signals —
    *
    *  - size/shape: n_chars, n_words, mean_word_len, stopword_frac
    *  - lexical diversity: frac_unique_words (1-gram stats),
    *    top_gram_frac + dup_gram_frac (2-gram repetition, Rae et al.)
    *  - information density: token_entropy
    *  - language: pred_lang (the marker heuristic — swap in
    *    [[graft.ext.Model.naiveBayesLangId]] when a labeled corpus is
    *    available)
    *  - rule filter: gopher_pass
    *  - fluency: mean_logprob + ppl_bucket (CCNet buckets under the
    *    corpus-trained LM)
    *  - leakage: contaminated (any 5-gram hit against `evalDocs`)
    *
    * Null conventions: docs too short for a signal carry NULL
    * (sub-2-token docs for the 2-gram fractions, unscoreable docs for
    * mean_logprob/ppl_bucket); `contaminated` is false when the doc
    * has no 5-gram at all.
    *
    * Scale shape: the per-row signals are one narrow codegen'd pass
    * (gram_stats is the native expression — zero shuffle); entropy and
    * the LM ride their audited aggregations; the final assembly is
    * doc-id equi-joins that AQE plans against the same key. At 100 TB
    * this is the "write the signals parquet next to the corpus" job —
    * one read of the text column, signal-sized output.
    */
  def qualitySignals(docs: DataFrame, evalDocs: DataFrame,
      textCol: String, idCol: String): DataFrame = {
    graft.plans.GraftExtensions.ensure(docs.sparkSession)
    val base = docs.select(col(idCol).cast("long").as("doc_id"),
      col(textCol).as("_t"))
    val row = base.select(col("doc_id"),
        length(col("_t")).cast("int").as("n_chars"),
        wordCount(col("_t")).cast("int").as("n_words"),
        meanWordLen(col("_t")).as("mean_word_len"),
        (stopwordCount(col("_t")).cast("double") /
          wordCount(col("_t"))).as("stopword_frac"),
        call_function("gram_stats", tokens(col("_t")), lit(1)).as("g1"),
        call_function("gram_stats", tokens(col("_t")), lit(2)).as("g2"),
        langId(col("_t")).as("pred_lang"))
      .select(col("doc_id"), col("n_chars"), col("n_words"),
        col("mean_word_len"), col("stopword_frac"),
        when(col("g1.n_grams") > 0,
          col("g1.distinct_grams").cast("double") /
            col("g1.n_grams").cast("double")).as("frac_unique_words"),
        when(col("g2.n_grams") > 0,
          col("g2.top_count").cast("double") /
            col("g2.n_grams").cast("double")).as("top_gram_frac"),
        when(col("g2.n_grams") > 0,
          lit(1.0) - col("g2.distinct_grams").cast("double") /
            col("g2.n_grams").cast("double")).as("dup_gram_frac"),
        col("pred_lang"))
    val gph = gopherRules(docs, textCol, idCol)
      .select(col("doc_id"), col("pass").as("gopher_pass"))
    val ent = tokenEntropy(docs, textCol, idCol)
      .select(col(idCol).as("doc_id"), col("token_entropy"))
    val ppl = perplexityBuckets(docs, textCol, idCol, nBuckets = 3)
      .select(col("doc_id"), col("mean_logprob"),
        col("bucket").as("ppl_bucket"))
    val contam = contamination(docs, evalDocs, textCol, idCol, n = 5)
      .select(col("doc_id"), col("contaminated"))
    row.join(gph, "doc_id")
      .join(ent, Seq("doc_id"), "left")
      .join(ppl, Seq("doc_id"), "left")
      .join(contam, Seq("doc_id"), "left")
      .withColumn("contaminated",
        coalesce(col("contaminated"), lit(false)))
  }

  /** Quality-signals v3 — [[qualitySignals]] (the v1 row) widened with
    * the remaining adjudicated per-doc signals so ONE pass over the
    * corpus writes the complete RedPajama-V2-style sidecar:
    * degenerate-repetition loop tags ([[repetitionLoop]] — full-text
    * minimal period, trailing loop period + repeat count),
    * encoding-garbage counts ([[encodingQuality]] — replacement/C0/C1
    * codepoints and the clean verdict), and the deflate compression
    * ratio ([[compressionRatio]]). The model-derived signals (KN
    * log-prob, trained-classifier verdicts, phrase tags, domain
    * rollup) live in the v2 row (`x_quality_signals_v2`) — the full
    * sidecar is v3 ⋈ v2 on doc_id.
    *
    * `compression_ratio` is the one column DuckDB cannot replay (zlib
    * output size is not a cross-engine contract — the
    * `x_text_compression_ratio` rows-only precedent), so the
    * REGISTERED v3 query drops it and stays hash-exact; the column is
    * spec-adjudicated (ExtISpec's deflate checks + TextSpec).
    *
    * `evalPred` (optional) additionally attaches `leak_depth` — the
    * EXACT longest token span each non-eval doc shares with the eval
    * rows ([[graft.ext.Suffix.contaminationSpanDepth]], base 4) — the
    * overlap-audit DEPTH beside the fixed-n `contaminated` boolean
    * (NULL for clean docs and for the eval rows themselves).
    *
    * Scale shape: every added signal is a narrow per-row pass
    * (codegen'd expressions; the deflate is the audited DeflateLen
    * native expression) except the optional depth (the audited
    * cross-set ladder — contamination-bound), assembled by doc_id
    * equi-joins — the same "write the signals parquet beside the
    * corpus" job as v1.
    */
  def qualitySignalsV3(docs: DataFrame, evalDocs: DataFrame,
      textCol: String, idCol: String,
      evalPred: Option[Column] = None): DataFrame = {
    val v1 = qualitySignals(docs, evalDocs, textCol, idCol)
    val loops = repetitionLoop(docs, textCol, idCol)
      .select(col("doc_id"), col("min_period"), col("tail_period"),
        col("tail_repeats"))
    val enc = encodingQuality(docs, textCol, idCol)
      .select(col("doc_id"), col("n_replacement"), col("n_control"),
        col("n_c1"), col("is_clean").as("encoding_clean"))
    val comp = compressionRatio(docs, textCol, idCol)
      .select(col("doc_id"), col("compression_ratio"))
    val base = v1.join(loops, "doc_id").join(enc, "doc_id")
      .join(comp, "doc_id")
    evalPred.fold(base) { p =>
      val depth = graft.ext.Suffix
        .contaminationSpanDepth(docs, textCol, idCol, p, baseLen = 4)
        .select(col("doc_id"), col("max_shared_span").as("leak_depth"))
      base.join(depth, Seq("doc_id"), "left")
    }
  }

  def tokenEntropy(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    // shuffle the DOCS, not the explode (r19, the bigramLogProbUnder
    // move): one doc-id exchange of raw rows replaces the (doc, token)
    // aggregation exchange AND the per-doc entropy exchange
    val tf = docs.repartition(col(idCol))
      .select(col(idCol), explode(tokens(col(textCol))).as("tok"))
      .filter(length(col("tok")) > 0)
      .groupBy(col(idCol), col("tok"))
      .agg(count(lit(1)).as("c"))
    val lnC = log(col("c").cast("double")).cast("decimal(20,12)").cast("double")
    tf
      .groupBy(col(idCol))
      .agg(sum(col("c")).cast("bigint").as("n_tokens"),
        sum((col("c").cast("double") * lnC).cast("decimal(30,14)")).as("s"))
      .select(col(idCol), col("n_tokens"),
        (log(col("n_tokens").cast("double")).cast("decimal(20,12)").cast("double") -
          col("s").cast("double") / col("n_tokens").cast("double"))
          .cast("decimal(20,12)").cast("double").as("token_entropy"))
  }

  /** Mixed-language document segmentation: the token stream is cut
    * into fixed `window`-token blocks, each block classified by the
    * [[langId]] marker heuristic, and CONSECUTIVE same-language blocks
    * merge into segments (gaps-and-islands: block index minus the
    * per-(doc, lang) rank is constant within an island) — the
    * curation primitive behind "split this crawl page into its English
    * body and embedded French quotes" that document-level language ID
    * by construction cannot express. Integer marker scores make every
    * block label, island id, and segment boundary SQL-replayable.
    *
    * Returns (doc_id, seg_idx, lang, start_token, n_tokens): segments
    * in stream order, start_token the 0-based offset of the segment's
    * first token.
    *
    * Scale shape: the block explode is ≤ len/window rows per doc
    * (narrow arithmetic on the token array — the window text never
    * leaves its row group); islands + segment ranks are per-doc
    * windows over O(blocks) rows.
    */
  def langSegments(docs: DataFrame, textCol: String, idCol: String,
      window: Int = 20): DataFrame = {
    require(window > 0)
    import org.apache.spark.sql.expressions.Window
    val blocks = docs
      .select(col(idCol).cast("long").as("doc_id"),
        tokens(col(textCol)).as("w"))
      .select(col("doc_id"), col("w"),
        explode(sequence(lit(0),
          expr(s"(size(w) - 1) div $window"))).as("b"))
      .select(col("doc_id"), col("b"),
        least(size(col("w")) - col("b") * window, lit(window))
          .cast("bigint").as("btoks"),
        langId(concat_ws(" ",
          slice(col("w"), col("b") * window + 1, lit(window)))).as("blang"))
    val wIsl = Window.partitionBy(col("doc_id"), col("blang"))
      .orderBy(col("b"))
    val wSeg = Window.partitionBy(col("doc_id"))
      .orderBy(col("start_token"))
    blocks
      .withColumn("isl", col("b") - row_number().over(wIsl))
      .groupBy(col("doc_id"), col("blang").as("lang"), col("isl"))
      .agg((min(col("b")) * window).cast("bigint").as("start_token"),
        sum(col("btoks")).cast("bigint").as("n_tokens"))
      .withColumn("seg_idx", row_number().over(wSeg).cast("bigint"))
      .select(col("doc_id"), col("seg_idx"), col("lang"),
        col("start_token"), col("n_tokens"))
  }

  /** Gopher-rules composite quality filter (Rae et al. 2021 Table A1 —
    * public literature; the rule bundle every Gopher-reproduction
    * pipeline applies before dedup), adapted to whitespace tokens:
    *
    *  - `r_words`:   minWords ≤ word count ≤ maxWords (Gopher: 50–100k)
    *  - `r_wordlen`: mean word length in [minMeanLen, maxMeanLen] (3–10)
    *  - `r_symbol`:  symbol-to-word ratio ≤ maxSymbolRatio (0.1;
    *                 symbols = '#' and '...' per the paper)
    *  - `r_alpha`:   fraction of words containing ≥1 alphabetic char
    *                 ≥ minAlphaFrac (0.80)
    *  - `r_stop`:    ≥ minStopwords stopword hits (2) — the "contains
    *                 real English glue" screen
    *
    * The paper's line-based rules (bullet-start / ellipsis-end
    * fractions) need newline structure this corpus doesn't carry; on
    * newline-delimited text they'd ride the same shape (split on \n,
    * two more fraction columns). Emits raw signals, per-rule booleans,
    * the composite `pass`, and `fail_reasons` (comma-joined rule names
    * in fixed order — both engines' concat_ws skips the NULL arms, so
    * the string replays exactly).
    *
    * Pure per-row expressions — narrow, zero shuffle, codegen'd; mean
    * word length is the exact integer-sum / count double division, so
    * every boolean replays bit-for-bit cross-engine.
    */
  def gopherRules(docs: DataFrame, textCol: String, idCol: String,
      minWords: Int = 50, maxWords: Int = 100000,
      minMeanLen: Double = 3.0, maxMeanLen: Double = 10.0,
      maxSymbolRatio: Double = 0.1, minAlphaFrac: Double = 0.8,
      minStopwords: Int = 2): DataFrame = {
    val txt = col(textCol)
    val base = docs.select(col(idCol).as("doc_id"),
      wordCount(txt).cast("bigint").as("n_words"),
      meanWordLen(txt).as("mean_word_len"),
      regexp_count(txt, lit("#|\\.\\.\\.")).cast("bigint").as("n_symbols"),
      size(filter(tokens(txt), w => w.rlike("[a-zA-Z]")))
        .cast("bigint").as("n_alpha_words"),
      stopwordCount(txt).cast("bigint").as("n_stopwords"))
    val rules = base
      .withColumn("r_words",
        col("n_words") >= minWords && col("n_words") <= maxWords)
      .withColumn("r_wordlen",
        col("mean_word_len") >= minMeanLen &&
          col("mean_word_len") <= maxMeanLen)
      .withColumn("r_symbol",
        col("n_symbols").cast("double") / col("n_words").cast("double")
          <= maxSymbolRatio)
      .withColumn("r_alpha",
        col("n_alpha_words").cast("double") / col("n_words").cast("double")
          >= minAlphaFrac)
      .withColumn("r_stop", col("n_stopwords") >= minStopwords)
    rules
      .withColumn("pass",
        col("r_words") && col("r_wordlen") && col("r_symbol") &&
          col("r_alpha") && col("r_stop"))
      .withColumn("fail_reasons", concat_ws(",",
        when(!col("r_words"), lit("words")),
        when(!col("r_wordlen"), lit("wordlen")),
        when(!col("r_symbol"), lit("symbol")),
        when(!col("r_alpha"), lit("alpha")),
        when(!col("r_stop"), lit("stop"))))
  }

  /** Gopher's LINE-level quality rules (Rae et al. 2021 Table A1 —
    * public literature; the two rules [[gopherRules]] documented as
    * untestable on a newline-free corpus): remove documents where more
    * than `maxBulletFrac` of lines start with a bullet marker ("- " or
    * "* ") or more than `maxEllipsisFrac` end with an ellipsis ("...").
    * Emits per-doc line counts, both fractions, per-rule booleans, and
    * the composite `pass`.
    *
    * Pure per-row expressions over `split(text, "\n")` — narrow, zero
    * shuffle, codegen'd; fractions are single int/int double divisions,
    * so every boolean replays bit-for-bit cross-engine.
    */
  def gopherLineRules(docs: DataFrame, textCol: String, idCol: String,
      maxBulletFrac: Double = 0.9,
      maxEllipsisFrac: Double = 0.3): DataFrame =
    docs
      .select(col(idCol).as("doc_id"), split(col(textCol), "\n").as("_lines"))
      .select(col("doc_id"),
        size(col("_lines")).cast("bigint").as("n_lines"),
        size(filter(col("_lines"),
          l => l.startsWith("- ") || l.startsWith("* ")))
          .cast("bigint").as("n_bullet_lines"),
        size(filter(col("_lines"), l => l.endsWith("...")))
          .cast("bigint").as("n_ellipsis_lines"))
      .withColumn("bullet_frac",
        col("n_bullet_lines").cast("double") / col("n_lines").cast("double"))
      .withColumn("ellipsis_frac",
        col("n_ellipsis_lines").cast("double") / col("n_lines").cast("double"))
      .withColumn("r_bullet", col("bullet_frac") <= maxBulletFrac)
      .withColumn("r_ellipsis", col("ellipsis_frac") <= maxEllipsisFrac)
      .withColumn("pass", col("r_bullet") && col("r_ellipsis"))

  /** Compression-ratio repetition signal (Gopher/RefinedWeb-standard
    * quality filter; Rae et al. 2021 — public literature): per-doc
    * `deflate_bytes / raw_utf8_bytes` under a fixed raw-DEFLATE
    * configuration ([[graft.plans.DeflateLen]]). Boilerplate and
    * template spam land well below natural prose; near-random text
    * approaches (or exceeds) 1. Complements [[repetitionSignals]]:
    * n-gram fractions see short-range repeats, deflate's 32 KiB window
    * catches long-range copies inside one document.
    *
    * Narrow zero-shuffle per-row pass, whole-stage-codegen'd (native
    * expression, not a UDF). `is_repetitive` flags ratio < `threshold`
    * among docs long enough for the ratio to mean anything (deflate
    * overhead dominates tiny inputs, so docs under `minBytes` are
    * never flagged).
    *
    * Spec-adjudicated (golden fixtures + ordering invariants), not
    * DuckDB-oracled: compressed SIZE is zlib-build-specific — see the
    * determinism note on [[graft.plans.DeflateLen]].
    */
  def compressionRatio(docs: DataFrame, textCol: String, idCol: String,
      threshold: Double = 0.4, minBytes: Int = 64): DataFrame = {
    graft.plans.GraftExtensions.ensure(docs.sparkSession)
    val txt = col(textCol).cast("string")
    docs
      .select(col(idCol).as("doc_id"),
        octet_length(txt).cast("bigint").as("n_bytes"),
        call_function("deflate_len", txt).cast("bigint")
          .as("n_deflate_bytes"))
      .withColumn("compression_ratio",
        when(col("n_bytes") > 0,
          col("n_deflate_bytes").cast("double") / col("n_bytes").cast("double"))
          .otherwise(lit(0.0)))
      .withColumn("is_repetitive",
        col("n_bytes") >= minBytes && col("compression_ratio") < threshold)
  }

  /** Encoding-garbage quality signals — the first filter every crawl
    * pipeline runs (CCNet/RefinedWeb preprocessing; public literature):
    * per-doc counts and fractions of
    *  - U+FFFD REPLACEMENT CHARACTER — the decoder's own damage marker.
    *    Invalid bytes AND unpaired surrogates become exactly this (or
    *    are dropped) at the UTF-8 decode boundary, so post-decode this
    *    column IS the invalid-byte/invalid-surrogate signal: a lone
    *    surrogate is unrepresentable in well-formed UTF-8 (RFC 3629),
    *    hence in a parquet string or a Spark UTF8String — there is no
    *    post-decode row where a direct surrogate count could be nonzero;
    *  - C0 control characters (except \t\n\r) plus DEL — binary spill;
    *  - C1 controls U+0080–U+009F — the mojibake signature of
    *    latin-1/cp1252 text mis-decoded or double-decoded as UTF-8.
    *
    * Pure per-row expressions (narrow, zero shuffle, codegen'd:
    * `replace`-length deltas and two RE2/Java-common regex classes).
    * `is_clean` = zero garbage codepoints of any class. Counts are
    * codepoints; fractions divide by the doc's codepoint length
    * (0.0 for empty docs). SQL-replayable on both engines.
    */
  def encodingQuality(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val txt = col(textCol).cast("string")
    val nChars = length(txt).cast("bigint")
    def cnt(stripped: Column): Column =
      (length(txt) - length(stripped)).cast("bigint")
    val nRepl = cnt(replace(txt, lit("\uFFFD"), lit("")))
    val nCtrl = cnt(regexp_replace(txt,
      lit("[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]"), lit("")))
    val nC1 = cnt(regexp_replace(txt, lit("[\\x80-\\x9F]"), lit("")))
    def frac(n: Column): Column =
      when(col("n_chars") > 0,
        n.cast("double") / col("n_chars").cast("double")).otherwise(lit(0.0))
    docs
      .select(col(idCol).as("doc_id"), nChars.as("n_chars"),
        nRepl.as("n_replacement"), nCtrl.as("n_control"), nC1.as("n_c1"))
      .withColumn("frac_replacement", frac(col("n_replacement")))
      .withColumn("frac_bad", frac(
        col("n_replacement") + col("n_control") + col("n_c1")))
      .withColumn("is_clean",
        col("n_replacement") === 0 && col("n_control") === 0 &&
          col("n_c1") === 0)
  }
}
