package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ext.Web

/** Incremental domain-level quality rollup — the streaming face of
  * [[graft.ext.Web.domainQuality]] (the FineWeb drop-whole-bad-domains
  * stage, fed continuously): each micro-batch's per-domain
  * (docs, passes) counts fold into the persisted per-domain totals,
  * and the CURRENT rollup — pass fraction and block verdict over
  * everything seen so far — is re-emitted per batch. Because the
  * counts are plain sums, the cumulative rollup after ANY batch split
  * equals the one-shot batch rollup exactly (order-free — the
  * FunnelStream composition property, on domain keys); the verdicts
  * are therefore the batch operator's verdicts the moment the same
  * data has flowed.
  *
  * State: one row per registered domain (url_domain, n_docs, n_pass)
  * — O(domains) ≪ corpus, the only thing the stream accumulates.
  * The count fold is NOT idempotent (a replayed batch would
  * double-count), so the state is GENERATION-addressed
  * ([[StateDir.readGenBefore]]/[[StateDir.writeGen]], the ShardStream
  * rule): a crash-replayed batch re-reads the untouched pre-batch
  * totals, recomputes identical sums, and overwrites its own
  * generation — exactly-once end to end with the per-batch overwrite
  * sink.
  */
object DomainStream {

  /** Fold one micro-batch into the domain state at `statePath`;
    * returns the CURRENT rollup (url_domain, n_docs, n_pass,
    * pass_frac, blocked) over everything seen through this batch.
    */
  def applyBatch(batch: DataFrame, statePath: String, urlCol: String,
      passCol: String, minPassFrac: Double,
      batchId: Long = 0L): DataFrame = {
    require(minPassFrac >= 0.0 && minPassFrac <= 1.0,
      "minPassFrac must be in [0, 1]")
    val spark = batch.sparkSession
    val delta = Web.withUrlParts(batch, urlCol)
      .groupBy(col("url_domain"))
      .agg(count(lit(1)).cast("bigint").as("n_docs"),
        sum(when(col(passCol), 1L).otherwise(0L)).cast("bigint")
          .as("n_pass"))
    val prior = StateDir.readGenBefore(spark, statePath, batchId)
    val merged = prior.fold(delta)(p =>
        p.unionByName(delta).groupBy(col("url_domain"))
          .agg(sum(col("n_docs")).cast("bigint").as("n_docs"),
            sum(col("n_pass")).cast("bigint").as("n_pass")))
      .localCheckpoint(true) // pin BEFORE the state write (the plan
                             // reads the prior generation's files)
    StateDir.writeGen(merged, statePath, batchId)
    merged
      .withColumn("pass_frac",
        col("n_pass").cast("double") / col("n_docs").cast("double"))
      .withColumn("blocked", col("pass_frac") < minPassFrac)
  }

  /** The readStream runner — foreachBatch wiring: each batch's full
    * current rollup lands in a per-batch output partition (overwrite =
    * replay-idempotent), counts fold into the generation-addressed
    * state.
    */
  def domainStream(docs: DataFrame, statePath: String, outPath: String,
      checkpoint: String, urlCol: String, passCol: String,
      minPassFrac: Double,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch, statePath, urlCol, passCol, minPassFrac, batchId)
          .write.mode("overwrite").parquet(s"$outPath/batch=$batchId")
        ()
      }
      .start()
}
