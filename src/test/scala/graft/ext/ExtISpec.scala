package graft.ext

import graft.SparkSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row

/** Round-12 operators: deflate compression-ratio signal (the
  * spec-adjudicated half of the driver contract — no DuckDB oracle can
  * deflate), encoding-garbage signals, and the paragraph-level
  * near-dup capstone's semantics on planted fixtures.
  */
class ExtISpec extends SparkSuite {
  import spark.implicits._

  // ---- compression ratio ------------------------------------------------

  private val repetitive =
    Seq.fill(120)("spam spam spam").mkString(" ")         // one phrase, 120×
  private val natural =
    (1 to 120).map(i => s"w${i * 7919 % 997}x${i * 104729 % 10007}")
      .mkString(" ")                                      // varied tokens
  private val incompressible = {
    // xorshift64 over 93 printable symbols: ~6.5 bits/char of genuine
    // entropy (a linear i*const % 93 walk is PERIODIC and crushes to
    // ~0.25 — deflate sees right through it)
    var x = 0x9E3779B97F4A7C15L
    (1 to 400).map { _ =>
      x ^= x << 13; x ^= x >>> 7; x ^= x << 17
      (java.lang.Long.remainderUnsigned(x, 93) + 33).toChar
    }.mkString("")
  }

  test("compressionRatio orders repetitive < natural < incompressible") {
    val df = Seq((1L, repetitive), (2L, natural), (3L, incompressible))
      .toDF("doc_id", "text")
    val out = Text.compressionRatio(df, "text", "doc_id")
      .orderBy("doc_id").collect()
    val ratio = out.map(r => r.getAs[Double]("compression_ratio"))
    assert(ratio(0) < 0.1, s"repetitive should crush: ${ratio(0)}")
    assert(ratio(1) > ratio(0) && ratio(1) < 0.9,
      s"natural in between: ${ratio(1)}")
    assert(ratio(2) > 0.75, s"high-entropy barely compresses: ${ratio(2)}")
    // the flag the downstream filter consumes
    assert(out.map(_.getAs[Boolean]("is_repetitive")).toSeq ===
      Seq(true, false, false))
  }

  test("compressionRatio is deterministic and byte-exact on n_bytes") {
    val df = Seq((1L, repetitive), (2L, natural)).toDF("doc_id", "text")
    val a = Text.compressionRatio(df, "text", "doc_id").orderBy("doc_id").collect()
    val b = Text.compressionRatio(df, "text", "doc_id").orderBy("doc_id").collect()
    assert(a.toSeq === b.toSeq)
    assert(a(0).getAs[Long]("n_bytes") ===
      repetitive.getBytes("UTF-8").length.toLong)
    // and the expression agrees with a direct JDK deflate of the bytes
    val d = new java.util.zip.Deflater(6, true)
    d.setInput(repetitive.getBytes("UTF-8")); d.finish()
    val buf = new Array[Byte](1 << 16)
    var n = 0
    while (!d.finished()) n += d.deflate(buf)
    d.end()
    assert(a(0).getAs[Long]("n_deflate_bytes") === n.toLong)
  }

  test("compressionRatio guards: short docs never flagged, empty doc is 0.0") {
    val df = Seq((1L, "aa aa aa"), (2L, "")).toDF("doc_id", "text")
    val out = Text.compressionRatio(df, "text", "doc_id")
      .orderBy("doc_id").collect()
    // 8 bytes of pure repetition — ratio is low but under minBytes
    assert(!out(0).getAs[Boolean]("is_repetitive"))
    assert(out(1).getAs[Long]("n_bytes") === 0L)
    assert(out(1).getAs[Double]("compression_ratio") === 0.0)
    assert(!out(1).getAs[Boolean]("is_repetitive"))
  }

  test("deflate_len null propagates and resolves via SQL") {
    graft.plans.GraftExtensions.ensure(spark)
    val rows = spark.sql(
      "SELECT deflate_len(CAST(NULL AS STRING)) AS a, deflate_len('') AS b")
      .collect()
    assert(rows(0).isNullAt(0))
    assert(rows(0).getInt(1) > 0) // empty input still emits a final block
  }

  // ---- encoding quality -------------------------------------------------

  test("encodingQuality counts each garbage class exactly") {
    val df = Seq(
      (1L, "clean plain text"),
      (2L, "bad\uFFFDmark\uFFFD\uFFFD end"),   // 3 replacement chars
      (3L, "ctl\u0007\u0001\u007Ftail\ttab\nnl"), // 3 control, tab/nl exempt
      (4L, "moji\u0085ba\u0096ke"),            // 2 C1
      (5L, "")).toDF("doc_id", "text")
    val out = Text.encodingQuality(df, "text", "doc_id")
      .orderBy("doc_id").collect()
    def r(i: Int, c: String) = out(i).getAs[Long](c)
    assert(r(0, "n_replacement") === 0L && r(0, "n_control") === 0L &&
      r(0, "n_c1") === 0L)
    assert(out(0).getAs[Boolean]("is_clean"))
    assert(r(1, "n_replacement") === 3L)
    assert(out(1).getAs[Double]("frac_replacement") ===
      3.0 / out(1).getAs[Long]("n_chars"))
    assert(r(2, "n_control") === 3L && r(2, "n_replacement") === 0L)
    assert(r(3, "n_c1") === 2L)
    assert(!out(1).getAs[Boolean]("is_clean"))
    assert(!out(2).getAs[Boolean]("is_clean"))
    assert(!out(3).getAs[Boolean]("is_clean"))
    // empty doc: all-zero counts, 0.0 fractions, clean
    assert(out(4).getAs[Long]("n_chars") === 0L)
    assert(out(4).getAs[Double]("frac_bad") === 0.0)
    assert(out(4).getAs[Boolean]("is_clean"))
  }

  // ---- gopher rules -------------------------------------------------------

  test("gopherRules: each rule fires alone and pass composes") {
    val fifty = (1 to 50).map(i => s"word$i").mkString(" ")
    val df = Seq(
      // 50 alphabetic ~6-char words + 2 stopwords = 52 words, all pass
      (1L, s"$fifty the a"),
      // under the word floor, everything else fine
      (2L, s"the a ${(1 to 10).map(i => s"word$i").mkString(" ")}"),
      // no stopwords
      (3L, fifty),
      // symbol spam: 10 '###' tokens → 30 '#' matches / 62 words =
      // 0.484 > 0.1, while alpha 52/62 = 0.839 stays above the floor
      (4L, s"$fifty the a ${Seq.fill(10)("###").mkString(" ")}"),
      // short words: mean length (2·50+3+1)/52 = 2.0 < 3
      (5L, s"${(1 to 50).map(_ => "ab").mkString(" ")} the a"))
      .toDF("doc_id", "text")
    val out = Text.gopherRules(df, "text", "doc_id")
      .orderBy("doc_id").collect()
    def reasons(i: Int) = out(i).getAs[String]("fail_reasons")
    assert(out(0).getAs[Boolean]("pass") && reasons(0) === "")
    assert(reasons(1) === "words")
    assert(reasons(2) === "stop")
    assert(reasons(3) === "symbol")
    assert(reasons(4) === "wordlen")
    assert(out.map(_.getAs[Boolean]("pass")).toSeq ===
      Seq(true, false, false, false, false))
    // raw signals: '###' is three '#' matches per token, 10 tokens
    assert(out(3).getAs[Long]("n_symbols") === 30L)
    assert(out(3).getAs[Long]("n_alpha_words") === 52L)
  }

  // ---- paragraph dedup ----------------------------------------------------

  test("paragraphDedup removes later near-dup paragraphs, keeps first") {
    // 12-token paragraphs at paraTokens=6 → 2 paragraphs per doc.
    val pA = "alpha beta gamma delta epsilon zeta"
    val pB = "one two three four five six"
    // pBnear swaps pB's last token: shingle sets share 3 of a 5-union
    // → j = 0.6, BELOW the 0.8 bar, so it must survive
    val pBnear = "one two three four five seven"
    val docs = Seq(
      (1L, s"$pA $pB"),         // first occurrence of both paragraphs
      (2L, s"$pB $pA"),         // both paragraphs duplicate doc 1's
      (3L, s"$pBnear $pA"))     // para 0 at j=0.6 survives the 0.8 bar
      .toDF("doc_id", "text")
    val out = Dedup.paragraphDedup(docs, "text", "doc_id",
      paraTokens = 6, minTokens = 3, threshold = 0.8)
      .orderBy("doc_id").collect()
    assert(out(0) === Row(1L, 2L, 0L, s"$pA $pB", 0.0))
    assert(out(1) === Row(2L, 2L, 2L, "", 1.0))
    // doc 3: pA dup removed, pBnear (j = 0.6 < 0.8) kept
    assert(out(2) === Row(3L, 2L, 1L, pBnear, 0.5))
  }

  test("paragraphDedup exempts short paragraphs and reassembles in order") {
    val p = "one two three four five six"
    val docs = Seq(
      (1L, s"$p tail"),  // 7 tokens → [6-token p, 1-token "tail"(short)]
      (2L, s"$p tail"))  // same: the short tail must NOT be deduped
      .toDF("doc_id", "text")
    val out = Dedup.paragraphDedup(docs, "text", "doc_id",
      paraTokens = 6, minTokens = 3, threshold = 0.8)
      .orderBy("doc_id").collect()
    assert(out(0) === Row(1L, 2L, 0L, s"$p tail", 0.0))
    // doc 2 loses the 6-token paragraph but keeps its short tail
    assert(out(1) === Row(2L, 2L, 1L, "tail", 0.5))
  }
}
