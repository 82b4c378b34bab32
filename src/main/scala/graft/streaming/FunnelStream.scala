package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ext.Text

/** Streaming quality funnel — the per-micro-batch face of the batch
  * attrition capstone (`x_pipeline_quality_funnel`): each arriving
  * batch is screened by the SAME three stages — encoding-garbage
  * screen → Gopher rules → CCNet fluency cut — against a STATIC
  * reference model. CCNet scores against a pretrained LM and fixed
  * thresholds (Wenzek et al. 2020); the batch capstone's self-trained
  * rank cut is replayed here as the boundary (score, id) threshold
  * ([[fluencyCutoff]]), so reference-corpus members keep their
  * one-shot verdicts EXACTLY and unseen documents get the standard
  * fixed-threshold semantics. Emits one report row per batch:
  * per-batch stage counts, cumulative counts, cumulative survival.
  *
  * State discipline: the cumulative counts are a SUM fold — neither
  * idempotent nor commutative under redelivery — so they ride the
  * generation-addressed convention ([[StateDir.readGenBefore]] /
  * [[StateDir.writeGen]], the ShardStream/PackStream rule): a
  * crash-replayed micro-batch re-reads the untouched pre-batch
  * generation, recomputes the identical counts, and idempotently
  * overwrites its own generation — the report row reproduces exactly.
  *
  * Composition contract (FunnelStreamSpec): for ANY split of the
  * reference corpus into batches, the per-batch counts SUM to the
  * one-shot funnel row and the final cumulative row equals it —
  * every stage verdict is a pure per-document function of the static
  * model (the encoding/Gopher signals trivially; fluency because
  * [[Text.bigramLogProbUnder]]'s per-doc scores are bit-identical
  * for model-corpus subsets).
  *
  * Scale shape (100 TB): every stage is a narrow per-row pass over
  * the batch plus broadcast joins against the O(vocabulary) model
  * tables; the state is ONE row per generation. Nothing in the fold
  * grows with the stream.
  */
object FunnelStream {

  /** The fluency cut of the reference corpus replayed as a threshold:
    * the boundary (mean_logprob, doc_id) of the LAST row with
    * bucket < keepBuckets under [[Text.perplexityBuckets]]'s total
    * order (score desc, id asc). A doc is fluent iff its (score, id)
    * precedes that boundary — for reference-corpus members this is
    * EXACTLY bucket < keepBuckets (the rank order is total, so the
    * rank cut and the lexicographic threshold agree even when tied
    * scores straddle the bucket boundary). O(1) driver collect.
    *
    * `model` (r20): a pre-trained pinned JM model
    * ([[Text.bigramLmTrain]] on the SAME modelDocs) scores the
    * reference corpus through the split-face probe instead of the
    * self-trained plan — bit-identical buckets (every bigram of the
    * model corpus is in-vocabulary under its own model; same integer
    * counts, same IEEE contribution tree), and the ONE training is
    * then shared with every `applyBatch` that threads the same handle
    * (the double-LM-training fix). JM face only — a model combined
    * with `kn = true` fails loudly instead of silently retraining.
    */
  def fluencyCutoff(modelDocs: DataFrame, textCol: String, idCol: String,
      nBuckets: Int = 3, keepBuckets: Int = 2,
      kn: Boolean = false,
      model: Option[Text.BigramLm] = None): (Double, Long) = {
    require(model.isEmpty || !kn,
      "a pinned JM model cannot score the KN face — drop `model` or kn")
    val buckets =
      if (kn) Text.perplexityBucketsKn(modelDocs, textCol, idCol, nBuckets)
      else model match {
        case Some(m) =>
          Text.perplexityBucketsWith(modelDocs, m, textCol, idCol, nBuckets)
        case None => Text.perplexityBuckets(modelDocs, textCol, idCol, nBuckets)
      }
    val b = buckets
      .filter(col("bucket") < keepBuckets)
      .orderBy(col("rn").desc).limit(1)
      .select(col("mean_logprob"), col("doc_id")).collect()
    require(b.nonEmpty, "fluency cutoff: no scoreable reference docs")
    (b(0).getDouble(0), b(0).getLong(1))
  }

  /** Screen one micro-batch and fold the cumulative attrition counts.
    * `bytesCol` is the raw "crawl bytes" text the byte-level filters
    * (encoding, Gopher) see; `rawCol` is the clean text the LM scores
    * — the funnel discipline of the batch capstone. The funnel's
    * fluent survivors additionally run the intra-document span-dedup
    * stage ([[graft.ext.Dedup.intraDocDedupHashed]] at `intraSpan` —
    * the batch master's stage 5, per-doc pure like every other funnel
    * verdict, so it joins the order-free composition contract) and
    * the report carries its surviving-token volume. Returns the
    * 1-row report (batch_id, per-batch counts + intra-kept tokens,
    * cumulative counts, cumulative survival_frac).
    */
  /** `kn = true` scores fluency under the Kneser–Ney reference model
    * ([[Text.bigramKneserNeyUnder]]) instead of the interpolated JM LM
    * — the CCNet-faithful face (KenLM is modified KN); the caller's
    * `cutLp`/`cutId` must come from [[fluencyCutoff]] with the SAME
    * `kn` flag. The composition contract is unchanged: scored docs ⊂
    * model corpus score bit-identically under either LM's split face.
    */
  def applyBatch(batch: DataFrame, statePath: String, batchId: Long,
      modelDocs: DataFrame, cutLp: Double, cutId: Long,
      rawCol: String, bytesCol: String, idCol: String,
      intraSpan: Int = 3, kn: Boolean = false,
      model: Option[Text.BigramLm] = None): DataFrame = {
    require(model.isEmpty || !kn,
      "a pinned JM model cannot score the KN face — drop `model` or kn")
    val spark = batch.sparkSession
    val enc = Text.encodingQuality(batch, bytesCol, idCol)
      .select(col("doc_id"), col("is_clean"))
    val gph = Text.gopherRules(batch, bytesCol, idCol)
      .select(col("doc_id"), col("pass"))
    // `model` (r20): a pre-trained pinned handle skips the per-batch
    // re-training of the split-face model on the same modelDocs —
    // identical scores (the split face's own tables are derived from
    // the same counts; see Text.bigramLmTrain)
    val lp = (if (kn)
        Text.bigramKneserNeyUnder(batch, modelDocs, rawCol, idCol)
      else model match {
        case Some(m) => Text.bigramLogProbWith(batch, m, rawCol, idCol)
        case None => Text.bigramLogProbUnder(batch, modelDocs, rawCol, idCol)
      })
      .select(col("doc_id"), col("mean_logprob"))
    val fluent = col("mean_logprob").isNotNull &&
      (col("mean_logprob") > cutLp ||
        (col("mean_logprob") === cutLp && col("doc_id") <= cutId))
    // pinned: the verdicts feed the count aggregate AND the fluent-set
    // join below — without the pin the LM scoring chain runs twice
    val verdicts = enc.join(gph, "doc_id").join(lp, Seq("doc_id"), "left")
      .select(col("doc_id"), col("is_clean"), col("pass"),
        (col("is_clean") && col("pass") && fluent).as("_fl"))
      .localCheckpoint(true)
    val agg = verdicts
      .agg(count(lit(1)).cast("bigint").as("n_all"),
        sum(when(col("is_clean"), 1L).otherwise(0L)).cast("bigint")
          .as("n_encoding_clean"),
        sum(when(col("is_clean") && col("pass"), 1L).otherwise(0L))
          .cast("bigint").as("n_gopher_pass"),
        sum(when(col("_fl"), 1L).otherwise(0L)).cast("bigint")
          .as("n_fluent"))
      .head()
    val (bAll, bEnc, bGph, bFlu) =
      (agg.getLong(0), agg.getLong(1), agg.getLong(2), agg.getLong(3))
    val bIntra = graft.ext.Dedup.intraDocDedupHashed(
        batch.select(col(idCol).cast("long").as("doc_id"),
            col(rawCol).cast("string").as("text"))
          .join(verdicts.filter(col("_fl")).select("doc_id"), "doc_id"),
        "text", "doc_id", span = intraSpan)
      .agg(coalesce(sum(col("n_kept_tokens")), lit(0L)).cast("bigint"))
      .head().getLong(0)
    // O(1)-row state: read the pre-batch generation, fold, overwrite
    // own generation (replay-idempotent by construction)
    // selectCountersOrZero: a pre-r17 state generation lacks
    // c_intra_tokens — fold it from 0 instead of throwing (StateDir's
    // widened-schema migration rule)
    val prior = StateDir.readGenBefore(spark, statePath, batchId)
      .map(st => StateDir.selectCountersOrZero(st,
        Seq("c_all", "c_encoding_clean", "c_gopher_pass", "c_fluent",
          "c_intra_tokens")).head())
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
      .getOrElse((0L, 0L, 0L, 0L, 0L))
    val (cAll, cEnc, cGph, cFlu, cIntra) =
      (prior._1 + bAll, prior._2 + bEnc, prior._3 + bGph,
        prior._4 + bFlu, prior._5 + bIntra)
    import spark.implicits._
    StateDir.writeGen(
      Seq((cAll, cEnc, cGph, cFlu, cIntra))
        .toDF("c_all", "c_encoding_clean", "c_gopher_pass", "c_fluent",
          "c_intra_tokens"),
      statePath, batchId)
    // zero guard: an empty first micro-batch has c_all = 0 — report
    // 0.0 survival (nothing has survived yet), never NaN
    Seq((batchId, bAll, bEnc, bGph, bFlu, bIntra, cAll, cEnc, cGph, cFlu,
        cIntra, if (cAll == 0L) 0.0 else cFlu.toDouble / cAll.toDouble))
      .toDF("batch_id", "n_all", "n_encoding_clean", "n_gopher_pass",
        "n_fluent", "n_intra_tokens", "c_all", "c_encoding_clean",
        "c_gopher_pass", "c_fluent", "c_intra_tokens", "survival_frac")
  }

  /** The readStream runner — foreachBatch wiring on the funnel
    * modality: per-batch report rows land in a per-batch output
    * partition (overwrite = replay-idempotent), the cumulative counts
    * fold into the generation-addressed state.
    */
  def funnelStream(docs: DataFrame, statePath: String, outPath: String,
      checkpoint: String, modelDocs: DataFrame, cutLp: Double, cutId: Long,
      rawCol: String, bytesCol: String, idCol: String,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow(),
      model: Option[Text.BigramLm] = None)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch, statePath, batchId, modelDocs, cutLp, cutId,
          rawCol, bytesCol, idCol, model = model)
          .write.mode("overwrite").parquet(s"$outPath/batch=$batchId")
        ()
      }
      .start()
}
