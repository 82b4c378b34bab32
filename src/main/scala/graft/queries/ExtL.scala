package graft.queries

import org.apache.spark.sql.functions._
import graft.ext._
import H.t

/** Round-15 operators: the contrastive domain-LM selector enabled by
  * the round's train/score LM split ([[Text.bigramLogProbUnder]]).
  */
object ExtL {

  /** Contrastive domain selection ([[Text.domainLmSelect]], the
    * CCNet / Moore–Lewis cross-entropy-difference signal): every
    * scoreable doc scored under the general corpus LM AND an in-domain
    * LM (here: the `source = 'src0'` slice — a deterministic,
    * SQL-expressible domain), selected when the per-bigram log-prob
    * advantage is positive. The oracle replays BOTH models through the
    * parameterized two-corpus LM CTEs ([[Ext.bigramLmCtesUnder]]) —
    * training counts, OOV inner-join restriction, canonical-decimal
    * contribution sums — so scores, deltas, NULL-delta OOV rows, and
    * verdicts all adjudicate hash-exact.
    */
  val xQualityDomainLm = Q(
    "x_quality_domain_lm",
    (s, dir) => {
      val docs = t(s, dir, "documents")
      Text.domainLmSelect(docs,
        docs.filter(col("source") === "src0"), "text", "doc_id",
        minDelta = 0.0)
        .select(col("doc_id"), col("n_bigrams"), col("lp_general"),
          col("n_bigrams_domain"), col("lp_domain"), col("delta"),
          col("selected"))
        .orderBy(col("doc_id"))
    },
    Some(s"""WITH d AS (SELECT doc_id, text FROM documents),
      dd AS (SELECT doc_id, text FROM documents WHERE source = 'src0'),
      ${Ext.bigramLmCtesUnder("g", "d", "d")},
      ${Ext.bigramLmCtesUnder("m", "d", "dd")}
      SELECT g.doc_id, g.n_bigrams, g.mean_logprob AS lp_general,
        m.n_bigrams AS n_bigrams_domain, m.mean_logprob AS lp_domain,
        m.mean_logprob - g.mean_logprob AS delta,
        COALESCE(m.mean_logprob - g.mean_logprob > 0.0, FALSE) AS selected
      FROM glpq g LEFT JOIN mlpq m USING (doc_id)
      ORDER BY g.doc_id"""))

  val queries: Seq[Q] = Seq(xQualityDomainLm)
}
