package graft.ext

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Aho–Corasick multi-phrase tagger: overlap/nesting/fail-link hand
  * cases, equality with the compositional n-gram-join twin, partition
  * independence.
  */
class PhraseSpec extends SparkSuite {
  import spark.implicits._

  private def collectTags(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("doc_id", "phrase").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq

  test("phraseMatch counts overlapping and nested occurrences") {
    val docs = Seq(
      (1L, "a a a"),        // "a a" overlaps: positions 1 and 2
      (2L, "a b c d"),      // nested: "a b" and "a b c" both hit
      (3L, "x a a b y"),    // fail-link: tracking "a a b" must still
                            // surface the suffix hit of "a b"
      (4L, ""),             // nothing
      (5L, "a  b")          // doubled space: the empty token between
                            // a and b is a POSITION, so "a b" must NOT
                            // match (raw-split alignment with the SQL
                            // replay's string_split)
    ).toDF("doc_id", "text")
    val out = collectTags(Phrase.phraseMatch(docs, "text", "doc_id",
      Seq("a a", "a b", "a b c", "a a b")))
    assert(out == Seq(
      (1L, "a a", 2L),
      (2L, "a b", 1L), (2L, "a b c", 1L),
      (3L, "a a", 1L), (3L, "a a b", 1L), (3L, "a b", 1L)))
  }

  test("phraseMatch equals the compositional n-gram-join twin") {
    val docs = (0L until 80L).map { i =>
      val toks = (0 until 12).map(j => s"w${(i * 7 + j * j) % 5}")
      (i, toks.mkString(" "))
    }.toDF("doc_id", "text")
    val phrases = Seq("w0", "w1 w2", "w0 w0", "w2 w4 w1", "zzz")
    val ac = collectTags(Phrase.phraseMatch(docs, "text", "doc_id", phrases))
    val join = collectTags(Phrase.phraseMatchJoin(docs, "text", "doc_id", phrases))
    assert(ac.nonEmpty && ac == join,
      "the one-pass automaton must reproduce the per-length join semantics")
  }

  test("phraseMatch is partition-independent and shuffle-free") {
    val docs = (0L until 50L)
      .map(i => (i, s"t${i % 3} t${i % 5} t${i % 3} t${i % 3}"))
      .toDF("doc_id", "text")
    val phrases = Seq("t0 t0", "t1", "t2 t2 t2")
    def run(parts: Int) = collectTags(
      Phrase.phraseMatch(docs.repartition(parts), "text", "doc_id", phrases))
    assert(run(1) == run(11))
    // zero exchanges: the scan emits final counts in place
    val plan = Phrase.phraseMatch(docs, "text", "doc_id", phrases)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      "the tagger must add no shuffle to a pipeline")
  }

  test("phraseRedact removes the overlap union and round-trips raw splits") {
    val docs = Seq(
      (1L, "x a b c y"), // "a b" and "b c" overlap on b → union a,b,c
      (2L, "a b"),       // fully redacted → empty survivor
      (3L, "q  r")       // untouched, doubled space preserved
    ).toDF("doc_id", "text")
    val out = Phrase.phraseRedact(docs, "text", "doc_id", Seq("a b", "b c"))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(out == Seq(
      (1L, "x y", 3L),
      (2L, "", 2L),
      (3L, "q  r", 0L)))
  }

  test("phraseMatch rejects duplicate and blank phrases") {
    val docs = Seq((1L, "a")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Phrase.phraseMatch(docs, "text", "doc_id", Seq("a", "a"))
    }
    intercept[IllegalArgumentException] {
      Phrase.phraseMatch(docs, "text", "doc_id", Seq(" "))
    }
    intercept[IllegalArgumentException] {
      Phrase.phraseMatch(docs, "text", "doc_id", Seq.empty)
    }
  }
}
