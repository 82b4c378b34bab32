package graft.ext

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Unigram-LM tokenizer (r13 operator, spec added r14 — the r13 round
  * shipped it gate-breaking with no unit coverage): Viterbi
  * segmentation invariants, the longest-piece preference the smoothed
  * probs induce, the loud guards, and train/encode determinism.
  */
class UnigramSpec extends SparkSuite {
  import spark.implicits._

  private def docs(texts: String*) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")

  test("viterbiPass segmentations re-assemble every word exactly") {
    val d = docs("the quick brown fox jumps", "the lazy dog dozes",
      "quick quick brown")
    val wq = Unigram.wordFreqs(d, "text")
    val seed = Unigram.seedCounts(wq, maxPiece = 4)
    val probs = Unigram.train(d, "text", maxPiece = 4, maxN = 12, rounds = 1)
    val segs = Unigram.viterbiPass(wq, probs, maxPiece = 4, maxN = 12)
      .collect()
    assert(segs.nonEmpty)
    segs.foreach { r =>
      val w = r.getString(r.fieldIndex("w"))
      // pieces come back in REVERSE (backpointer-walk) order
      val pieces = r.getSeq[String](r.fieldIndex("pieces")).reverse
      assert(pieces.mkString("") == w,
        s"segmentation of '$w' does not re-assemble: $pieces")
      assert(pieces.forall(p => p.nonEmpty && p.length <= 4),
        s"piece length out of range for '$w': $pieces")
    }
    // model rows cover the whole seed vocabulary (smoothing, not pruning)
    assert(probs.count() == seed.count())
  }

  test("single-repeated-word corpus keeps the whole word as one piece") {
    // vocab over "zzzz": pieces z/zz/zzz/zzzz with seed counts 4f/3f/2f/f
    // → lp ≈ ln(.4)/ln(.3)/ln(.2)/ln(.1); [zzzz] = -2.30 beats
    // [zz,zz] = -2.41 and [zzz,z] = -2.53, so Viterbi takes the word whole
    val d = docs(Seq.fill(8)("zzzz").mkString(" "))
    val enc = Unigram.encode(d, "text", "doc_id",
      maxPiece = 4, maxN = 12, rounds = 2).collect()
    assert(enc.length == 1)
    val r = enc.head
    assert(r.getLong(r.fieldIndex("n_tokens")) == 8L)
    assert(r.getLong(r.fieldIndex("n_chars")) == 32L)
    assert(r.getLong(r.fieldIndex("n_pieces")) == 8L,
      "each 'zzzz' must segment as the single piece [zzzz]")
    assert(r.getDouble(r.fieldIndex("chars_per_piece")) == 4.0)
  }

  test("train is deterministic across runs (hard EM, fixed rounds)") {
    val d = docs("abab baba abab", "ab ba abab baba")
    val one = Unigram.train(d, "text", maxPiece = 3, maxN = 8, rounds = 2)
      .orderBy("piece").collect().toSeq
    val two = Unigram.train(d, "text", maxPiece = 3, maxN = 8, rounds = 2)
      .orderBy("piece").collect().toSeq
    assert(one == two)
    // every learned piece is a substring of some corpus word
    val words = Set("abab", "baba", "ab", "ba")
    one.foreach { r =>
      val p = r.getString(0)
      assert(words.exists(_.contains(p)), s"piece '$p' not from the corpus")
    }
  }

  test("loud guards: DP unroll overflow raises, maxN >= 100 is rejected") {
    val d = docs("short but thirteenchars13")
    val ex = intercept[Exception] {
      Unigram.train(d, "text", maxPiece = 4, maxN = 12, rounds = 1).collect()
    }
    def chain(t: Throwable): String =
      if (t == null) "" else t.toString + chain(t.getCause)
    assert(chain(ex).contains("DP unroll"),
      s"expected the unroll guard, got: ${chain(ex)}")
    intercept[IllegalArgumentException] {
      Unigram.train(d, "text", maxPiece = 4, maxN = 120, rounds = 1)
    }
    intercept[IllegalArgumentException] {
      Unigram.viterbiPass(
        Unigram.wordFreqs(d, "text"),
        Unigram.train(d, "text", maxPiece = 2, maxN = 25, rounds = 1),
        maxPiece = 2, maxN = 100)
    }
  }
}
