package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-phrase tagging — the Dolma-style tagger/blocklist stage
  * (Soldaini et al. 2024 tag documents with phrase-list hits;
  * UT1-style blocklists and toxicity word lists are the production
  * instances — public literature): count, per document, every
  * occurrence of every phrase from a (possibly large) phrase list,
  * matches at TOKEN boundaries, overlapping occurrences included.
  *
  * The engine face is a token-level Aho–Corasick automaton (Aho &
  * Corasick 1975 — public literature): the phrase list compiles ONCE
  * into a goto/fail trie (broadcast to executors), and every document
  * is scanned in ONE token pass emitting all phrase hits of ALL
  * lengths simultaneously — vs the compositional alternative of one
  * n-gram equi-join per distinct phrase length (which re-shuffles the
  * corpus per length). This is the mapPartitions-justified case: the
  * automaton is a compiled kernel (per-token hash-map transitions +
  * fail links) that no Column-expression composition expresses in one
  * pass; [[phraseMatchJoin]] IS that composition, kept as the
  * plan-auditable twin and the spec cross-check.
  *
  * Scale shape (100 TB): the automaton is O(Σ phrase tokens) and
  * broadcasts (blocklists are thousands of phrases — KBs); the scan is
  * partition-parallel, shuffle-free, and emits only positive counts
  * (sparse); the output aggregation is already per-(doc, phrase) local
  * to the scan, so the operator adds ZERO exchanges to a pipeline.
  * Matching is exact token equality — normalization (casefold etc.) is
  * the caller's upstream transform.
  */
object Phrase {

  /** Token-level Aho–Corasick: states are phrase-token-sequence
    * prefixes; `goto` maps (state, token) → state; `fail` is the
    * longest proper suffix that is also a prefix; `out` carries every
    * phrase id ENDING at the state (own + inherited via fail), so one
    * forward pass counts all (overlapping, nested) occurrences.
    */
  private[ext] final class TokenAc(phrases: Array[Array[String]])
      extends Serializable {
    private val goto =
      scala.collection.mutable.ArrayBuffer(
        scala.collection.mutable.HashMap.empty[String, Int])
    private val outOwn =
      scala.collection.mutable.ArrayBuffer(List.empty[Int])
    // trie
    for (pid <- phrases.indices) {
      var s = 0
      for (tok <- phrases(pid)) {
        s = goto(s).getOrElseUpdate(tok, {
          goto += scala.collection.mutable.HashMap.empty[String, Int]
          outOwn += Nil
          goto.size - 1
        })
      }
      outOwn(s) = pid :: outOwn(s)
    }
    private val fail = Array.fill(goto.size)(0)
    private val out = Array.fill(goto.size)(List.empty[Int])
    // BFS fail links; out = own ++ out(fail)
    locally {
      val q = scala.collection.mutable.Queue.empty[Int]
      out(0) = outOwn(0)
      for ((_, s) <- goto(0)) { fail(s) = 0; out(s) = outOwn(s); q += s }
      while (q.nonEmpty) {
        val u = q.dequeue()
        for ((tok, v) <- goto(u)) {
          var f = fail(u)
          while (f != 0 && !goto(f).contains(tok)) f = fail(f)
          fail(v) = goto(f).get(tok).filter(_ != v).getOrElse(0)
          out(v) = outOwn(v) ++ out(fail(v))
          q += v
        }
      }
    }

    private val plen = phrases.map(_.length)

    /** Mark every token covered by ANY phrase occurrence (overlaps
      * union): one forward pass, same transitions as [[count]], each
      * hit at end position i flagging [i − len + 1, i].
      */
    def markMatches(toks: Array[String]): Array[Boolean] = {
      val killed = new Array[Boolean](toks.length)
      var s = 0
      var i = 0
      while (i < toks.length) {
        val tok = toks(i)
        while (s != 0 && !goto(s).contains(tok)) s = fail(s)
        s = goto(s).getOrElse(tok, 0)
        var hits = out(s)
        while (hits.nonEmpty) {
          var j = i - plen(hits.head) + 1
          while (j <= i) { killed(j) = true; j += 1 }
          hits = hits.tail
        }
        i += 1
      }
      killed
    }

    /** phrase id → occurrence count over one token sequence. */
    def count(toks: Array[String]): scala.collection.Map[Int, Long] = {
      val acc = scala.collection.mutable.HashMap.empty[Int, Long]
      var s = 0
      var i = 0
      while (i < toks.length) {
        val tok = toks(i)
        while (s != 0 && !goto(s).contains(tok)) s = fail(s)
        s = goto(s).getOrElse(tok, 0)
        var hits = out(s)
        while (hits.nonEmpty) {
          val pid = hits.head
          acc.update(pid, acc.getOrElse(pid, 0L) + 1L)
          hits = hits.tail
        }
        i += 1
      }
      acc
    }
  }

  /** One-pass Aho–Corasick tagging: (doc_id, phrase, n_matches) for
    * every phrase with ≥ 1 token-boundary occurrence in the doc
    * (overlaps and nested phrases all counted). Zero shuffles.
    */
  def phraseMatch(docs: DataFrame, textCol: String, idCol: String,
      phrases: Seq[String]): DataFrame = {
    require(phrases.nonEmpty, "phrase list must be non-empty")
    // RAW whitespace split on BOTH sides (docs and phrases): an empty
    // token from a doubled space is a token like any other, so the
    // automaton, the join twin, and the SQL replay see the identical
    // position sequence — a phrase with leading/trailing/doubled
    // spaces would silently never match, so reject it instead
    require(phrases.forall(p => p.split(" ", -1).forall(_.nonEmpty)),
      "phrases must be space-separated non-empty tokens")
    require(phrases.distinct.size == phrases.size,
      "phrase list must be duplicate-free")
    val spark = docs.sparkSession
    import spark.implicits._
    val phraseArr = phrases.toArray
    // ONE broadcast carrying both the raw strings (id → phrase) and
    // the split token arrays — nothing phrase-sized rides the task
    // closure, so a large blocklist ships once per executor, not once
    // per task
    val bc = spark.sparkContext.broadcast(
      (phraseArr, phraseArr.map(_.split(" "))))
    docs.select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as[(Long, String)]
      .mapPartitions { it =>
        // compile ONCE per partition from the broadcast phrase list
        val ac = new TokenAc(bc.value._2)
        val local = bc.value._1 // stable ids → phrase strings
        it.flatMap { case (id, text) =>
          if (text == null) Iterator.empty
          else {
            // raw split, -1 limit: trailing empties are positions too
            // (mirrors split()/string_split in the twin and oracle)
            val toks = text.split(" ", -1)
            ac.count(toks).iterator.map { case (pid, n) =>
              (id, local(pid), n)
            }
          }
        }
      }
      .toDF("doc_id", "phrase", "n_matches")
  }

  /** Blocklist REDACTION — the action face of [[phraseMatch]] (Dolma
    * taggers feed removal passes; UT1-style blocklist hits get cut):
    * every token covered by ANY phrase occurrence is removed (overlap
    * union — deterministic and order-free), the document rebuilt from
    * the survivors. Same automaton, same single shuffle-free token
    * pass; output (doc_id, redacted_text, n_removed_tokens) for EVERY
    * input doc.
    */
  def phraseRedact(docs: DataFrame, textCol: String, idCol: String,
      phrases: Seq[String]): DataFrame = {
    require(phrases.nonEmpty, "phrase list must be non-empty")
    require(phrases.forall(p => p.split(" ", -1).forall(_.nonEmpty)),
      "phrases must be space-separated non-empty tokens")
    require(phrases.distinct.size == phrases.size,
      "phrase list must be duplicate-free")
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(
      phrases.toArray.map(_.split(" ")))
    docs.select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val ac = new TokenAc(bc.value)
        it.map { case (id, text) =>
          if (text == null) (id, "", 0L)
          else {
            val toks = text.split(" ", -1)
            val killed = ac.markMatches(toks)
            val sb = new StringBuilder
            var removed = 0L
            var first = true
            var i = 0
            while (i < toks.length) {
              if (killed(i)) removed += 1L
              else {
                // separator by POSITION, not by buffer emptiness — a
                // kept EMPTY token still takes its separator slot
                // (array_to_string semantics in the oracle)
                if (!first) sb.append(' ')
                sb.append(toks(i))
                first = false
              }
              i += 1
            }
            (id, sb.toString, removed)
          }
        }
      }
      .toDF("doc_id", "redacted_text", "n_removed_tokens")
  }

  /** The compositional twin: one n-gram equi-join per DISTINCT phrase
    * length (grams built narrowly, joined against the broadcast phrase
    * table). Same result set as [[phraseMatch]]; costs one corpus
    * n-gram pass per distinct length — the shape the automaton
    * collapses into one pass. Kept as the plan-auditable baseline and
    * the spec cross-check.
    */
  def phraseMatchJoin(docs: DataFrame, textCol: String, idCol: String,
      phrases: Seq[String]): DataFrame = {
    require(phrases.nonEmpty, "phrase list must be non-empty")
    val spark = docs.sparkSession
    import spark.implicits._
    val ph = phrases.map(p => (p, p.split(" ", -1).length))
    val lens = ph.map(_._2).distinct.sorted
    val phDf = broadcast(ph.toDF("phrase", "len"))
    val toks = docs.select(col(idCol).cast("long").as("doc_id"),
      Text.tokens(col(textCol)).as("_w"))
    val grams = lens.map(l =>
        toks.select(col("doc_id"),
          explode(Text.ngramArray(col("_w"), l)).as("phrase"),
          lit(l).as("len")))
      .reduce(_.unionByName(_))
    grams.join(phDf, Seq("phrase", "len"))
      .groupBy(col("doc_id"), col("phrase"))
      .agg(count(lit(1)).cast("bigint").as("n_matches"))
  }
}
