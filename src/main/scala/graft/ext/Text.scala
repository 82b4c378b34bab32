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
  private def lnStable(c: Column): Column =
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

  /** Rolling polynomial fingerprint over the word sequence
    * (order-sensitive): fp = fold((acc*1000003 + h(w)) mod (2^31-1));
    * h(w) = len*961 + 31*code(first) + code(last). Word hash is kept
    * simple so the oracle can recompute it in SQL; all intermediates
    * stay < 2^62 (no Long overflow).
    */
  def fingerprint(text: Column): Column = {
    val t = tokens(text)
    val hashes = transform(t, w =>
      (length(w) * lit(961) + ascii(w) * lit(31) + ascii(w.substr(lit(-1), lit(1)))).cast("long"))
    aggregate(hashes, lit(0L), (acc, x) => (acc * lit(1000003L) + x) % lit(2147483647L))
  }
}
