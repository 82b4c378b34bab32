package graft.ext

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Round-15: contrastive domain-LM selection semantics on a hand
  * fixture — OOV conservatism, the vocabulary-restriction invariant,
  * and self-consistency with the single-corpus LM face.
  */
class ExtLSpec extends SparkSuite {
  import spark.implicits._

  test("domainLmSelect: OOV docs are null-delta and never selected; restriction invariant holds") {
    // unambiguous-conditional fixture (hand-computed): doc 1's three
    // bigrams all have conditional ratio 1 under BOTH models, so its
    // delta reduces to the unigram interpolation term — positive
    // because the domain corpus (8 tokens) concentrates unigram mass
    // vs the general corpus (12): ln(0.7+0.3·2/8) − ln(0.7+0.3·2/12)
    // ≈ +0.033 per bigram. Doc 2 shares only 2 of its 4 bigrams with
    // the domain vocabulary (the restriction invariant, nontrivial);
    // doc 3 shares none.
    val docs = Seq(
      (1L, "cats sit on mats"),
      (2L, "dogs sit on stocks today"),
      (3L, "zz qq ww")                      // fully OOV vs the domain
    ).toDF("doc_id", "text")
    val domain = Seq(
      (10L, "cats sit on mats"),
      (11L, "dogs sit on mats")
    ).toDF("doc_id", "text")

    val out = Text.domainLmSelect(docs, domain, "text", "doc_id")
      .orderBy("doc_id").collect()
    val byId = out.map(r => r.getLong(0) -> r).toMap
    assert(out.length == 3)

    // OOV conservatism: no domain-vocab bigram => NULL score/delta,
    // NOT selected
    assert(byId(3L).isNullAt(byId(3L).fieldIndex("lp_domain")))
    assert(byId(3L).isNullAt(byId(3L).fieldIndex("delta")))
    assert(!byId(3L).getAs[Boolean]("selected"),
      "an OOV doc must not be selected")

    // restriction invariant: the domain score averages over a SUBSET
    // of the doc's bigrams
    for (id <- Seq(1L, 2L) if !byId(id).isNullAt(
        byId(id).fieldIndex("n_bigrams_domain")))
      assert(byId(id).getAs[Long]("n_bigrams_domain") <=
        byId(id).getAs[Long]("n_bigrams"))

    // the in-domain doc's every bigram is domain-vocab, and it must
    // score better under the concentrated domain model (sign
    // guaranteed by the hand computation above)
    assert(byId(1L).getAs[Long]("n_bigrams") == 3L)
    assert(byId(1L).getAs[Long]("n_bigrams_domain") == 3L)
    assert(byId(1L).getAs[Boolean]("selected"),
      "the in-domain doc must be selected")
    // the restriction is visible on doc 2: only its shared bigrams
    // ("dogs sit", "sit on") carry a domain score
    assert(byId(2L).getAs[Long]("n_bigrams") == 4L)
    assert(byId(2L).getAs[Long]("n_bigrams_domain") == 2L)

    // self-consistency: lp_general IS the single-corpus LM face
    val self = Text.bigramLogProb(docs, "text", "doc_id")
      .select(col("doc_id"), col("mean_logprob")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    out.foreach(r => assert(r.getAs[Double]("lp_general") ==
      self(r.getLong(0)), "lp_general must equal bigramLogProb"))

    // determinism
    val again = Text.domainLmSelect(docs, domain, "text", "doc_id")
      .orderBy("doc_id").collect()
    assert(out.toSeq == again.toSeq)
  }
}
