package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for LLM training-data pipelines
  * (BASELINE.json north star; SURVEY.md §2.8): tokenization, quality
  * scoring, language-ID heuristic, document fingerprinting. All are
  * per-row column expressions — narrow, codegen'd, shuffle-free.
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
