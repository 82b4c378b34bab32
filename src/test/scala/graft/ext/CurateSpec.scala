package graft.ext

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Hand-computed checks for the curation operators (repetition signals,
  * PII redaction, decontamination, mixture resampling); the oracle
  * differential runs via the x_* Curate queries.
  */
class CurateSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"
  private lazy val docs = spark.read.parquet(s"$dir/documents.parquet")

  private def df(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("ngramArray: bigrams in order, short docs yield empty") {
    val out = df(1L -> "a b c d", 2L -> "solo")
      .select(col("doc_id"), Text.ngramArray(split(col("text"), " "), 2).as("g"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(out(1L) == Seq("a b", "b c", "c d"))
    assert(out(2L).isEmpty)
  }

  test("repetitionSignals: hand-computed fractions") {
    // "x x x y": bigrams [x x, x x, x y] -> n=3 distinct=2 top=2
    val out = Text.repetitionSignals(df(1L -> "x x x y", 2L -> "p q r"), "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r).toMap
    val r1 = out(1L)
    assert(r1.getAs[Long]("n_grams") == 3 && r1.getAs[Long]("distinct_grams") == 2
      && r1.getAs[Long]("top_count") == 2)
    assert(math.abs(r1.getAs[Double]("top_gram_frac") - 2.0 / 3.0) < 1e-15)
    assert(math.abs(r1.getAs[Double]("dup_gram_frac") - 1.0 / 3.0) < 1e-15)
    val r2 = out(2L) // no repeats
    assert(r2.getAs[Long]("n_grams") == 2 && r2.getAs[Double]("dup_gram_frac") == 0.0)
  }

  test("redactPii: counts and typed placeholders") {
    val d = df(1L -> "mail bob.smith@ex.com call 555-123-4567 host 10.1.2.3 end",
      2L -> "nothing sensitive here")
    val out = d.select(col("doc_id"),
      Text.piiEmailCount(col("text")).as("e"),
      Text.piiPhoneCount(col("text")).as("p"),
      Text.piiIpv4Count(col("text")).as("i"),
      Text.redactPii(col("text")).as("red"))
      .collect().map(r => r.getLong(0) -> r).toMap
    val r1 = out(1L)
    assert(r1.getAs[Int]("e") == 1 && r1.getAs[Int]("p") == 1 && r1.getAs[Int]("i") == 1)
    assert(r1.getAs[String]("red") == "mail <EMAIL> call <PHONE> host <IP> end")
    assert(out(2L).getAs[String]("red") == "nothing sensitive here")
  }

  test("contamination: full overlap, zero overlap, short docs dropped") {
    val eval = df(0L -> "a b c d e f")
    val corpus = df(10L -> "a b c d e f", 11L -> "p q r s t u v", 12L -> "x y")
    val out = Text.contamination(corpus, eval, "text", "doc_id", n = 5)
      .collect().map(r => r.getLong(0) -> r).toMap
    val dup = out(10L) // both 5-grams shared with eval
    assert(dup.getAs[Long]("n_grams") == 2 && dup.getAs[Long]("n_hit") == 2
      && dup.getAs[Boolean]("contaminated"))
    val clean = out(11L)
    assert(clean.getAs[Long]("n_hit") == 0 && !clean.getAs[Boolean]("contaminated"))
    assert(!out.contains(12L), "doc shorter than n should produce no grams")
  }

  test("hashed-gram contamination equals the string-gram result on real docs") {
    val eval = docs.filter(col("doc_id") < 10)
    val corpus = docs.filter(col("doc_id") >= 10)
    val plain = Text.contamination(corpus, eval, "text", "doc_id", n = 5)
      .orderBy(col("doc_id")).collect().toSeq
    val hashed = Text.contamination(corpus, eval, "text", "doc_id", n = 5,
      hashedGrams = true)
      .orderBy(col("doc_id")).collect().toSeq
    assert(hashed == plain, "hashing the gram keys changed the verdicts")
  }

  test("native gram_stats matches the relational formulation on real docs") {
    // includes n=3 to exercise a non-default gram size through both paths
    for (n <- Seq(2, 3)) {
      val fast = Text.repetitionSignals(docs, "text", "doc_id", n)
        .orderBy(col("doc_id")).collect().toSeq
      val ref = Text.repetitionSignalsShuffled(docs, "text", "doc_id", n)
        .orderBy(col("doc_id")).collect().toSeq
      assert(fast == ref, s"gram_stats diverges from relational formulation at n=$n")
    }
  }

  test("tokenBudget: greedy ordered prefix per group") {
    import spark.implicits._
    // en: 10+15 fit in 30, third doc (weight 10, cum 35) overflows;
    // de: single doc over budget kept out entirely
    val d = Seq((1L, "en", 10), (2L, "en", 15), (3L, "en", 10),
      (4L, "de", 40), (5L, "fr", 30))
      .toDF("doc_id", "lang", "n_words")
    val kept = Sampling.tokenBudget(d, col("lang"), col("n_words"),
      col("doc_id"), budget = 30L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 2L, 5L))
  }

  test("mixture resampling: rate bounds and content-keyed determinism") {
    val d = docs.select(col("doc_id"),
      Text.langId(col("text")).as("lang"),
      Text.fingerprint(col("text")).as("fp"))
    val n = d.count()
    val all = Sampling.mixtureResample(d, col("fp"), col("lang"),
      Map.empty, defaultPerMille = 1000).count()
    assert(all == n, "rate 1000 must keep everything")
    val none = Sampling.mixtureResample(d, col("fp"), col("lang"),
      Map.empty, defaultPerMille = 0).count()
    assert(none == 0, "rate 0 must keep nothing")
    val rates = Map("en" -> 200)
    val k1 = Sampling.mixtureResample(d, col("fp"), col("lang"), rates)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // re-shuffled input, same selection: the whole point of content keying
    val k2 = Sampling.mixtureResample(d.repartition(7, col("fp")),
      col("fp"), col("lang"), rates)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(k1 == k2, "selection must not depend on partitioning")
    assert(k1.size < n, "downweighted language must actually shrink")
  }

  test("sequence packing: boundary arithmetic and split detection") {
    import spark.implicits._
    // seqLen 10, one group, 0-based stream positions: docs of 4+4+4
    // tokens — the third (positions 8..11) straddles the sequence-0/1
    // boundary; the 7-token doc (12..18) and the 1-token doc (19) both
    // stay inside sequence 1, which ends exactly at position 19
    val d = Seq((1L, 4), (2L, 4), (3L, 4), (4L, 7), (5L, 1))
      .map { case (id, n) => (id, "g", n) }.toDF("doc_id", "lang", "n_words")
    val got = Sampling.packSequences(d, col("lang"), col("n_words"),
        col("doc_id"), seqLen = 10L)
      .orderBy(col("doc_id"))
      .collect().map(r => (r.getAs[Long]("seq_first"),
        r.getAs[Long]("seq_last"), r.getAs[Long]("n_splits")))
    assert(got === Array((0L, 0L, 0L), (0L, 0L, 0L), (0L, 1L, 1L),
      (1L, 1L, 0L), (1L, 1L, 0L)))
  }

  test("sequence packing: assignment survives repartitioning") {
    val d = docs.select(col("doc_id"),
      Text.langId(col("text")).as("lang"),
      Text.wordCount(col("text")).as("n_words"))
    def run(df: org.apache.spark.sql.DataFrame) =
      Sampling.packSequences(df, col("lang"), col("n_words"),
          col("doc_id"), seqLen = 512L)
        .select("doc_id", "seq_first", "seq_last")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(run(d) === run(d.repartition(7, col("n_words"))))
  }
}
