package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming near-dup dedup (SURVEY.md §2.8 × §2.9): a document stream
  * is deduplicated per micro-batch against the accumulated cross-batch
  * MinHash signature state ([[graft.ext.Dedup.minhashDedupIncremental]])
  * and survivors land in a per-batch output partition.
  *
  * Exactly-once story: foreachBatch re-runs a micro-batch after a
  * crash; the batch-tagged state check makes the replay recompute the
  * IDENTICAL survivor set (same-batch signatures are ignored), and the
  * overwrite-into-`batch=<id>` sink makes the re-write idempotent — so
  * neither duplicates (the reference's redelivery behavior, SURVEY
  * §2.9) nor losses (the naive replay-yields-zero-survivors shape)
  * reach the output.
  *
  * This is `dropDuplicatesWithinWatermark`'s big sibling: that one is
  * exact-key with watermark-bounded state; this one is NEAR-dup with
  * signature-sized state that intentionally never expires (dedup
  * against the full corpus history is the point).
  */
object DedupStream {

  def nearDupDedupStream(docs: DataFrame, textCol: String, idCol: String,
      statePath: String, outPath: String, checkpoint: String,
      k: Int = 3, threshold: Double = 0.5,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val survivors = graft.ext.Dedup.minhashDedupIncremental(
          batch, textCol, idCol, statePath, k, threshold,
          batchTag = Some(batchId))
        survivors.write.mode("overwrite").parquet(s"$outPath/batch=$batchId")
        ()
      }
      .start()

  /** Paragraph-granularity sibling (round 12): a document stream is
    * deduplicated at SUB-document granularity against the accumulated
    * paragraph-signature state
    * ([[graft.ext.Dedup.paragraphDedupIncremental]] — exact-first
    * representatives, in-batch min-pid survivor, cross-batch signature
    * check), and each batch's per-doc DAMAGE REPORT (paragraph counts,
    * removed count, re-assembled text) lands in its output partition —
    * the streaming face of the Dolma-style paragraph pass. Same
    * exactly-once shape: batch-tagged state for idempotent replay,
    * overwrite-into-`batch=<id>` sink.
    */
  def paragraphDedupStream(docs: DataFrame, textCol: String, idCol: String,
      statePath: String, outPath: String, checkpoint: String,
      paraTokens: Int = 20, minTokens: Int = 5, threshold: Double = 0.8,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val report = graft.ext.Dedup.paragraphDedupIncremental(
          batch, textCol, idCol, statePath, paraTokens, minTokens,
          threshold, batchTag = Some(batchId))
        report.write.mode("overwrite").parquet(s"$outPath/batch=$batchId")
        ()
      }
      .start()

  /** The embedding-modality sibling (round 8): a vector stream is
    * deduplicated per micro-batch against accumulated hyperplane-LSH
    * state ([[graft.ext.Similarity.cosineLshIncremental]] — exact-
    * cosine verified, so no false drops beyond band recall). Same
    * exactly-once shape: batch-tagged state for idempotent replay,
    * overwrite-into-`batch=<id>` sink.
    */
  def embeddingDedupStream(vecs: DataFrame, idCol: String, vecCol: String,
      statePath: String, outPath: String, checkpoint: String,
      threshold: Double = 0.9,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    vecs.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val survivors = graft.ext.Similarity.cosineLshIncremental(
          batch, idCol, vecCol, statePath, threshold,
          batchTag = Some(batchId))
        survivors.write.mode("overwrite").parquet(s"$outPath/batch=$batchId")
        ()
      }
      .start()
}
