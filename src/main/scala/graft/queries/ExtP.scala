package graft.queries

import org.apache.spark.sql.functions._
import graft.ext.Dedup
import H.t

/** Round-18 operators: the EXACT-FIRST incremental span excision (the
  * clone-robust streaming counterpart of the suffix exact-first
  * excision), the KN-fluency master face, the composed learned-
  * blocklist streaming adjudication, the full quality sidecar
  * (v3 ⋈ v2), and the deterministic epoch-order shuffle over packed
  * sequences.
  */
object ExtP {

  /** Exact-first incremental span excision
    * ([[graft.ext.Dedup.spanDedupIncrementalExactFirst]], span 10,
    * sha-256 content-addressed state keys) driven over two id-ordered
    * batches through REAL accumulated state — adjudicated against the
    * ONE-SHOT text-keyed replay, which the id-ordered composition
    * provably equals (the [[graft.ext.Dedup.spanDedupIncremental]]
    * equivalence, inherited through the digest collapse + closed-form
    * member reconstruction argued on the operator's scaladoc and
    * proven in CurateStreamSpec). `agrees_hashed` additionally runs
    * the FINGERPRINT incremental face
    * ([[graft.ext.Dedup.spanDedupIncremental]], 8-byte rolling keys)
    * over the same split and compares row-wise — the oracle pins it
    * TRUE, so a 64-bit key collision (or any drift between the two
    * incremental faces) fails the gate loudly: the standing
    * hash-collision-audit convention, applied to the streaming
    * excision.
    */
  val xDedupSpanIncrementalExactFirst = Q(
    "x_dedup_span_incremental_exact_first",
    (s, dir) => {
      val d = t(s, dir, "documents")
      val state = java.nio.file.Files
        .createTempDirectory("graft_span_incr_ef").toString
      val batches = Seq(d.filter(col("doc_id") < 250),
        d.filter(col("doc_id") >= 250))
      val ef = batches.zipWithIndex.map { case (b, i) =>
        Dedup.spanDedupIncrementalExactFirst(b, "text", "doc_id", 10,
          s"$state/ef", batchTag = Some(i.toLong))
      }.reduce(_.unionByName(_))
      val fp = batches.zipWithIndex.map { case (b, i) =>
        Dedup.spanDedupIncremental(b, "text", "doc_id", 10,
          s"$state/fp", batchTag = Some(i.toLong), hashedState = true)
      }.reduce(_.unionByName(_))
      ef.join(fp.select(col("doc_id"), col("n_kept_tokens").as("_h_nk"),
          col("deduped_text").as("_h_dt")), "doc_id")
        .select(col("doc_id"), col("n_tokens"), col("n_kept_tokens"),
          col("n_removed"), col("deduped_text"),
          (col("n_kept_tokens") === col("_h_nk") &&
            col("deduped_text") === col("_h_dt")).as("agrees_hashed"))
        .orderBy(col("doc_id"))
    },
    Some(s"""WITH ${ExtE.spanDedupCtes("si", "documents", 10,
        perDoc = false)}
      SELECT doc_id, n_tokens, n_kept_tokens,
        CAST(n_tokens - n_kept_tokens AS BIGINT) AS n_removed,
        deduped_text, TRUE AS agrees_hashed
      FROM sires ORDER BY doc_id"""))

  val queries: Seq[Q] = Seq(xDedupSpanIncrementalExactFirst)
}
