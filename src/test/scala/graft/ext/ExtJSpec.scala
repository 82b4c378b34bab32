package graft.ext

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Round-13 operators: checksum-validated PII (Luhn / IBAN mod-97) on
  * golden fixtures — validity in both directions, word-boundary
  * candidate extraction, and validated-only redaction.
  */
class ExtJSpec extends SparkSuite {
  import spark.implicits._

  // ---- PII wave 2: Luhn + IBAN checksums --------------------------------

  test("luhnValid and ibanValid agree with the reference checksums") {
    val cards = Seq(
      ("4111111111111111", true), ("4111111111111112", false),
      ("5500005555555559", true), ("4532015112830366", true),
      ("1234567890123456", false))
    val ibans = Seq(
      ("DE89370400440532013000", true), ("DE89370400440532013001", false),
      ("AT611904300234573201", true), ("AT611904300234573202", false),
      ("PL61109010140000071219812874", true))
    val got = cards.map(_._1).toDF("c")
      .select(col("c"), Text.luhnValid(col("c")).as("v"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    cards.foreach { case (c, exp) =>
      assert(got(c) == exp, s"luhn($c) = ${got(c)}, expected $exp") }
    val gotI = ibans.map(_._1).toDF("c")
      .select(col("c"), Text.ibanValid(col("c")).as("v"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    ibans.foreach { case (c, exp) =>
      assert(gotI(c) == exp, s"iban($c) = ${gotI(c)}, expected $exp") }
  }

  test("piiChecksums: boundary extraction, both verdicts, validated-only redaction") {
    val df = Seq(
      // valid card + invalid card + valid IBAN: only valid ones redact
      (1L, "pay 4111111111111111 not 4111111111111112 " +
        "to DE89370400440532013000 today"),
      // 20-digit run: word-bounded 16-digit pattern must NOT fire
      (2L, "serial 41111111111111112222 is not a card"),
      // invalid IBAN: candidate counted, never redacted
      (3L, "acct AT611904300234573202 pending"),
      (4L, "clean text with no identifiers at all"),
      // r13 advice scenario: a VALID card co-occurring with a longer
      // digit run that embeds it — redaction must be boundary-aware
      // and leave the 20-digit serial byte-identical
      (5L, "pay 4111111111111111 serial 41111111111111112222 end")
    ).toDF("doc_id", "text")
    val out = Text.piiChecksums(df, "text", "doc_id").orderBy("doc_id")
      .collect().map(r => r.getLong(0) -> r).toMap

    assert(out(1L).getLong(1) == 2 && out(1L).getLong(2) == 1, "card counts")
    assert(out(1L).getLong(3) == 1 && out(1L).getLong(4) == 1, "iban counts")
    assert(out(1L).getBoolean(5))
    assert(out(1L).getString(6) ==
      "pay <PAN> not 4111111111111112 to <IBAN> today",
      s"redaction wrong: ${out(1L).getString(6)}")

    assert(out(2L).getLong(1) == 0, "20-digit run must not be a candidate")
    assert(!out(2L).getBoolean(5))

    assert(out(3L).getLong(3) == 1 && out(3L).getLong(4) == 0,
      "invalid IBAN is candidate-only")
    assert(out(3L).getString(6).contains("AT611904300234573202"),
      "invalid candidate must be left in place")

    assert(out(4L).getLong(1) == 0 && out(4L).getLong(3) == 0 &&
      !out(4L).getBoolean(5))
    assert(out(4L).getString(6) == "clean text with no identifiers at all")

    assert(out(5L).getLong(1) == 1 && out(5L).getLong(2) == 1,
      "only the word-bounded 16-digit run is a candidate")
    assert(out(5L).getString(6) ==
      "pay <PAN> serial 41111111111111112222 end",
      s"boundary-aware redaction wrong: ${out(5L).getString(6)}")
  }

  // ---- line-level Gopher rules -------------------------------------------

  test("gopherLineRules: bullet and ellipsis fractions fire per the paper") {
    val df = Seq(
      (1L, "- one\n- two\n- three\n* four\nbody line here"), // 4/5 bullets
      (2L, "intro\nwait for it...\nmore to come...\nend"),   // 2/4 ellipsis
      (3L, "plain first line\nplain second line")            // clean
    ).toDF("doc_id", "text")
    val out = Text.gopherLineRules(df, "text", "doc_id",
      maxBulletFrac = 0.5, maxEllipsisFrac = 0.3)
      .orderBy("doc_id").collect()
    assert(out(0).getAs[Long]("n_lines") == 5 &&
      out(0).getAs[Long]("n_bullet_lines") == 4)
    assert(!out(0).getAs[Boolean]("r_bullet") &&
      !out(0).getAs[Boolean]("pass"))
    assert(out(1).getAs[Long]("n_ellipsis_lines") == 2 &&
      !out(1).getAs[Boolean]("r_ellipsis"))
    assert(out(2).getAs[Boolean]("pass"))
  }

  test("paragraphDedupLines: newline segmentation, near-dup removal, " +
      "newline re-assembly, short-line exemption") {
    val pA = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu"                                   // 12 tokens
    val pAnear = pA.stripSuffix("mu") + "nu"        // j = 9/11 ≈ 0.82 >= 0.8
    val pB = "one two three four five six seven"
    val pC = "eight nine ten eleven twelve thirteen fourteen" // doc-3 only
    val out = Dedup.paragraphDedupLines(Seq(
        (1L, s"$pA\n$pB"),
        (2L, s"$pAnear\nshort tail"),               // near-dup + exempt line
        (3L, s"$pC\n$pC")                           // exact in-doc dup
      ).toDF("doc_id", "text"), "text", "doc_id",
      minTokens = 5, threshold = 0.8)
      .orderBy("doc_id").collect()
    assert(out(0).getAs[Long]("n_removed") == 0 &&
      out(0).getAs[String]("deduped_text") == s"$pA\n$pB")
    assert(out(1).getAs[Long]("n_removed") == 1 &&
      out(1).getAs[String]("deduped_text") == "short tail",
      s"near-dup line must fall, exempt short line must stay: " +
        out(1).getAs[String]("deduped_text"))
    assert(out(2).getAs[Long]("n_removed") == 1 &&
      out(2).getAs[String]("deduped_text") == pC)
  }

  // ---- Naive Bayes model filter ------------------------------------------

  test("naiveBayes: counts, smoothed log-probs, verdicts on a hand fixture") {
    val df = Seq(
      (1L, "good good fine", true),
      (2L, "good nice", true),
      (3L, "bad bad awful", false),
      (4L, "bad sad", false),
      (5L, "good good bad", true),    // mixed, label pos
      (6L, "", false)                 // zero tokens → priors only
    ).toDF("doc_id", "text", "label")

    val model = Model.naiveBayesModel(df, "text", "doc_id", "label")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    // class token totals: pos = 8, neg = 5; vocab = 7 tokens... recount:
    // tokens pos: good×2,fine | good,nice | good×2,bad → good 5, fine 1,
    // nice 1, bad 1 (n_pos = 8); neg: bad×2,awful | bad,sad → bad 3,
    // awful 1, sad 1 (n_neg = 5); vocab = {good,fine,nice,bad,awful,sad}
    // (6; the empty doc contributes nothing)
    assert(model("good")._1 == 5 && model("good")._2 == 0)
    assert(model("bad")._1 == 1 && model("bad")._2 == 3)
    assert(model.size == 6)
    def lnCanon(x: Double): Double =
      BigDecimal(math.log(x)).setScale(12, BigDecimal.RoundingMode.HALF_UP)
        .toDouble
    assert(model("good")._3 == lnCanon(6.0 / 14.0), "lp_pos(good)")
    assert(model("good")._4 == lnCanon(1.0 / 11.0), "lp_neg(good)")

    val out = Model.naiveBayesFilter(df, "text", "doc_id", "label")
      .orderBy("doc_id").collect()
    val byId = out.map(r => r.getLong(0) -> r).toMap
    assert(byId(1L).getAs[Boolean]("predicted") &&
      byId(1L).getAs[Boolean]("correct"))
    assert(!byId(3L).getAs[Boolean]("predicted") &&
      byId(3L).getAs[Boolean]("correct"))
    // doc 5: good dominates (5 pos occurrences vs bad's 3 neg) → pos
    assert(byId(5L).getAs[Boolean]("predicted"))
    // empty doc: scores are the priors alone (3 pos of 6 docs = ln 0.5)
    assert(byId(6L).getAs[Long]("n_tokens") == 0L)
    assert(byId(6L).getAs[Double]("score_pos") == lnCanon(0.5))
    assert(!byId(6L).getAs[Boolean]("predicted"),
      "prior tie must predict negative (conservative)")
  }

  test("naiveBayes: vocab broadcast guard degrades to a shuffle join with identical scores") {
    val df = Seq(
      (1L, "good good fine", true),
      (2L, "good nice", true),
      (3L, "bad bad awful", false),
      (4L, "bad sad", false),
      (5L, "good good bad", true)
    ).toDF("doc_id", "text", "label")

    // vocab = 6 tokens: default bound broadcasts, bound 1 must NOT
    val bcast = Model.naiveBayesFilter(df, "text", "doc_id", "label")
    val shuffled = Model.naiveBayesFilter(df, "text", "doc_id", "label",
      maxBroadcastVocab = 1L)
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getBoolean(4), r.getBoolean(5), r.getBoolean(6))
    assert(bcast.orderBy("doc_id").collect().map(key).toSeq ==
      shuffled.orderBy("doc_id").collect().map(key).toSeq,
      "guarded shuffle join must score identically to the broadcast path")

    // plan shape: the contract under test is the HINT — the guard must
    // not FORCE a broadcast of an above-bound model (a tiny test model
    // may still auto-broadcast on size; production vocab won't). The
    // priors' own 1-row broadcast hint is always present, so assert the
    // model hint as the count DELTA between the two faces.
    def hintCount(d: org.apache.spark.sql.DataFrame): Int =
      "ResolvedHint".r.findAllIn(d.queryExecution.analyzed.toString).length
    val guarded = Model.naiveBayesFilter(df, "text", "doc_id", "label",
      maxBroadcastVocab = 0L)
    assert(hintCount(bcast) == hintCount(guarded) + 1,
      "above-bound vocab must drop exactly the model's broadcast hint")
  }

  private def hints(d: org.apache.spark.sql.DataFrame): Int =
    "ResolvedHint".r.findAllIn(d.queryExecution.analyzed.toString).length

  test("langid: gram-vocab broadcast guard degrades with identical verdicts") {
    val df = Seq((1L, "aaa bbb", "x"), (2L, "aab bba", "x"),
      (3L, "ccc ddd", "y"), (4L, "ccd dde", "y")).toDF("doc_id", "t", "y")
    val bcast = Model.naiveBayesLangId(df, "t", "doc_id", "y")
    val shuffled = Model.naiveBayesLangId(df, "t", "doc_id", "y",
      maxBroadcastVocab = 1L)
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getString(1), r.getDouble(2))
    assert(bcast.orderBy("doc_id").collect().map(key).toSeq ==
      shuffled.orderBy("doc_id").collect().map(key).toSeq,
      "guarded shuffle join must score identically to the broadcast path")
    // the guard drops exactly the class-gram model's hint (the class
    // table's O(classes) broadcasts stay on both faces)
    assert(hints(bcast) == hints(shuffled) + 1,
      "above-bound gram vocab must drop exactly the model's hint")
  }

  test("bigram split-face model guard degrades with identical scores") {
    val docs = Seq(1L -> "a b c d", 2L -> "b c d e").toDF("doc_id", "text")
    val model = Seq(10L -> "a b c d e a b", 11L -> "b c a d")
      .toDF("doc_id", "text")
    val bcast = Text.bigramLogProbUnder(docs, model, "text", "doc_id")
    val shuffled = Text.bigramLogProbUnder(docs, model, "text", "doc_id",
      maxBroadcastVocab = 0L)
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))
    assert(bcast.orderBy("doc_id").collect().map(key).toSeq ==
      shuffled.orderBy("doc_id").collect().map(key).toSeq,
      "guarded shuffle joins must score identically to the broadcast path")
    // three model-table hints drop (bigram table + both unigram sides);
    // the 1-row totals broadcast stays on both faces
    assert(hints(bcast) == hints(shuffled) + 3,
      "above-bound model vocab must drop exactly the three model hints")
  }
}
