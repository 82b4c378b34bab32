package graft.ext

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Round-16 wave 2: Kneser–Ney bigram smoothing (hand-computed
  * continuation probabilities) and the gradient-descent logistic
  * regression (hand-walked first iteration, separable-fixture
  * convergence, partition independence of the exact-decimal
  * trajectory).
  */
class ExtNSpec extends SparkSuite {
  import spark.implicits._

  private def lnCanon(x: Double): Double =
    BigDecimal(math.log(x)).setScale(12, BigDecimal.RoundingMode.HALF_UP)
      .toDouble

  /** bf·lnStable(p) then the DECIMAL(20,12) contribution rounding —
    * the engine's exact per-position pipeline, replicated.
    */
  private def contrib(bf: Long, p: Double): BigDecimal =
    BigDecimal(bf.toDouble * lnCanon(p))
      .setScale(12, BigDecimal.RoundingMode.HALF_UP)

  test("bigramKneserNey: hand-computed continuation backoff on a fixture") {
    // corpus bigrams: "a b"×2 (d1), "b a"×1 (d1), "a c"×1 (d2)
    //   ctx a: ctot=3, fan-out 2;  ctx b: ctot=1, fan-out 1
    //   fan-in: a←1, b←1, c←1;  B = 3 bigram types
    val df = Seq((1L, "a b a b"), (2L, "a c")).toDF("doc_id", "text")
    val out = Text.bigramKneserNey(df, "text", "doc_id")
      .orderBy("doc_id").collect()
    val pAB = (2.0 - 0.75) / 3.0 + (0.75 * 2.0 / 3.0) * (1.0 / 3.0)
    val pBA = (1.0 - 0.75) / 1.0 + (0.75 * 1.0 / 1.0) * (1.0 / 3.0)
    val pAC = (1.0 - 0.75) / 3.0 + (0.75 * 2.0 / 3.0) * (1.0 / 3.0)
    val d1 = out(0)
    assert(d1.getAs[Long]("n_bigrams") == 3L)
    assert(d1.getAs[Double]("sum_logprob") ==
      (contrib(2L, pAB) + contrib(1L, pBA)).toDouble)
    val d2 = out(1)
    assert(d2.getAs[Long]("n_bigrams") == 1L)
    assert(d2.getAs[Double]("sum_logprob") == contrib(1L, pAC).toDouble)
    // continuation backoff is the POINT: "b" is frequent (2 of 5
    // tokens) but only ever follows "a" — its continuation share is
    // the type fraction 1/3, not the raw-frequency 2/5 a JM mix uses
    assert(pAB < (2.0 - 0.75) / 3.0 + (0.75 * 2.0 / 3.0) * (2.0 / 5.0))
  }

  test("bigramKneserNeyUnder: unseen bigrams score on pure continuation") {
    // model: "a b a c" → bigrams "a b", "b a", "a c"; B = 3
    //   ctx a: ctot 2, fan-out 2; ctx b: ctot 1, fan-out 1
    //   fan-in: b←1, a←1, c←1
    val model = Seq((0L, "a b a c")).toDF("doc_id", "text")
    val score = Seq((1L, "a b b a"), (3L, "c a z")).toDF("doc_id", "text")
    val out = Text.bigramKneserNeyUnder(score, model, "text", "doc_id")
      .orderBy("doc_id").collect()
    // doc 3: "c a" fails the context check (c never opens a model
    // bigram), "a z" fails the fan-in check (z never closes one) —
    // no scoreable bigram, doc absent
    assert(out.length == 1 && out(0).getLong(0) == 1L)
    val pAB = (1.0 - 0.75) / 2.0 + (0.75 * 2.0 / 2.0) * (1.0 / 3.0)
    val pBB = 0.0 / 1.0 + (0.75 * 1.0 / 1.0) * (1.0 / 3.0) // UNSEEN: c clips to 0
    val pBA = (1.0 - 0.75) / 1.0 + (0.75 * 1.0 / 1.0) * (1.0 / 3.0)
    assert(out(0).getAs[Long]("n_bigrams") == 3L)
    assert(out(0).getAs[Double]("sum_logprob") ==
      (contrib(1L, pAB) + contrib(1L, pBB) + contrib(1L, pBA)).toDouble)
  }

  test("bigramKneserNeyUnder self face equals bigramKneserNey") {
    val docs = (0L until 30L)
      .map(i => (i, s"w${i % 5} w${(i * 7) % 4} w${i % 5} w${i % 3}"))
      .toDF("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(rows(Text.bigramKneserNey(docs, "text", "doc_id")) ==
      rows(Text.bigramKneserNeyUnder(docs, docs, "text", "doc_id")))
  }

  test("bigramKneserNey is partition-independent (exact decimal sums)") {
    val docs = (0L until 40L)
      .map(i => (i, s"w${i % 7} w${(i * 3) % 5} w${i % 7} w${(i + 1) % 11} w${i % 3}"))
      .toDF("doc_id", "text")
    def run(parts: Int) =
      Text.bigramKneserNey(docs.repartition(parts), "text", "doc_id")
        .orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(run(1) == run(13))
  }

  test("repetitionLoop: hand-checked periods, repeats, and the cap") {
    val docs = Seq(
      (1L, "a b a b a b"),   // fully 2-periodic; 3 trailing blocks
      (2L, "x x x x x x x x x x"), // 1-periodic, repeats cap at 8
      (3L, "a b c"),          // nothing
      (4L, "c d la di la di") // trailing loop only, not full-periodic
    ).toDF("doc_id", "text")
    val out = Text.repetitionLoop(docs, "text", "doc_id")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        Option(r.get(2)), Option(r.get(3)), Option(r.get(4)))).toSeq
    assert(out == Seq(
      (1L, 6L, Some(2), Some(2), Some(3)),
      (2L, 10L, Some(1), Some(1), Some(8)), // capped at maxRepeats
      (3L, 3L, None, None, None),
      (4L, 6L, None, Some(2), Some(2))))
  }

  // the engine's replayable token hash, replicated for hand-walks
  private def bucket(tok: String, dims: Int): Long = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val hex = md.digest(tok.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16) % dims
  }

  test("logReg: one hand-walked gradient step from zero weights") {
    // w0 = 0 → z = 0 exactly → σ = 0.5 exactly for every doc, so the
    // first gradient is g_j = Σ_i (0.5 − y_i)·x_ij by hand
    val df = Seq((1L, "x x", true), (2L, "z", false))
      .toDF("doc_id", "text", "label")
    val dims = 4
    val bx = bucket("x", dims)
    val by = bucket("z", dims)
    assert(bx != by, "fixture needs non-colliding tokens")
    val step = BigDecimal("0.000100")
    val w = Model.logRegModel(df, "text", "doc_id", "label",
        dims = dims, iters = 1, step = "0.000100")
      .orderBy("bucket").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(w(bx) == (step * BigDecimal("1.0")).toDouble,   // −step·(−0.5·2)
      "positive-doc token bucket moves up by step·|g|")
    assert(w(by) == (-step * BigDecimal("0.5")).toDouble,  // −step·(0.5·1)
      "negative-doc token bucket moves down")
    assert(w(dims.toLong) == 0.0, // residuals cancel: −0.5 + 0.5
      "bias gradient cancels on this fixture")
    assert(w.keySet == (0 to dims).map(_.toLong).toSet)
    (0L until dims.toLong).filter(b => b != bx && b != by)
      .foreach(b => assert(w(b) == 0.0, s"untouched bucket $b stays 0"))
  }

  test("logReg: separable fixture converges to all-correct verdicts") {
    val df = (
      (1L to 8L).map(i => (i, "good " * 5 + s"pad$i", true)) ++
      (9L to 16L).map(i => (i, "bad " * 5 + s"pad$i", false))
    ).toDF("doc_id", "text", "label")
    val out = Model.logRegFilter(df, "text", "doc_id", "label",
      dims = 16, iters = 25, step = "0.010000")
    assert(out.filter(!col("correct")).count() == 0L,
      "linearly separable labels must train to 100% on-corpus accuracy")
    // verdict is the exact-decimal logit sign
    val row = out.orderBy("doc_id").collect()(0)
    assert(row.getAs[Boolean]("predicted") == (row.getAs[Double]("score") > 0))
  }

  test("logReg: the weight trajectory is partition-independent") {
    val df = (0L until 60L)
      .map(i => (i, s"t${i % 9} t${(i * 5) % 11} t${i % 4} t${i % 9}", i % 3 != 0))
      .toDF("doc_id", "text", "label")
    def weights(parts: Int) =
      Model.logRegModel(df.repartition(parts), "text", "doc_id", "label",
          dims = 8, iters = 6, step = "0.001000")
        .orderBy("bucket").collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(weights(1) == weights(17),
      "exact-decimal gradients must not depend on partitioning")
  }

  test("logReg: zero-token docs ride the bias feature") {
    val df = Seq((1L, "good good", true), (2L, "", false), (3L, "bad", false))
      .toDF("doc_id", "text", "label")
    val out = Model.logRegFilter(df, "text", "doc_id", "label",
        dims = 4, iters = 3, step = "0.010000")
      .orderBy("doc_id").collect()
    assert(out.length == 3, "empty doc must still be scored")
    assert(out(1).getAs[Long]("n_tokens") == 0L)
  }
}
