package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.ext.Rank

/** Incremental token-balanced shard assignment — the streaming face of
  * [[graft.ext.Sampling.shardAssign]] (the foreachBatch companion,
  * same state protocol as [[CdcStream]]): each micro-batch of new
  * documents is dealt into the currently-emptiest shards, continuing
  * the LPT discipline from the PERSISTED per-shard token totals, so a
  * corpus arriving over many batches still lands in balanced training
  * shards without re-shuffling what was already placed (placed docs
  * never move — the property a continuously-ingesting training
  * pipeline needs, since earlier shards may already be packed and
  * shipped).
  *
  * Deal rule (deterministic, SQL-replayable): batch docs ranked by
  * (tokens DESC, id), shards ranked by (persisted token_sum ASC,
  * shard); rank r goes to the shard at order position (r−1) mod n —
  * the biggest new docs land in the emptiest shards first, and each
  * shard receives within one doc of B/n of the batch. With comparable
  * batch mixes the load gap self-corrects: the emptiest shard always
  * receives the largest share of new token mass.
  *
  * Scale shape: one range-partitioned global rank over the BATCH
  * ([[graft.ext.Rank.globalRowNumber]] — no single-partition window),
  * one broadcast of the O(nShards) order table, one map-side-
  * combinable per-shard delta aggregate; state is O(nShards) rows,
  * crash-safe via [[StateDir]] replace-by-rename.
  */
object ShardStream {

  /** Deal one document micro-batch into the shard state at
    * `statePath`; returns this batch's per-doc placements
    * (id, toks, shard). State rows: (shard, n_docs, token_sum).
    *
    * `batchId` (the foreachBatch id) addresses the state GENERATION:
    * the capacity fold is neither idempotent nor commutative, so a
    * crash-replayed batch must see the PRE-batch totals — it reads the
    * newest generation `< batchId`, recomputes the identical deal, and
    * overwrites its own generation ([[StateDir.readGenBefore]]).
    */
  def applyBatch(batch: DataFrame, statePath: String, id: Column,
      tokens: Column, nShards: Int, batchId: Long = 0L): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    val spark = batch.sparkSession
    val base = batch.select(id.cast("long").as("id"),
      tokens.cast("long").as("toks"))
    val prior0 = StateDir.readGenBefore(spark, statePath, batchId)
    val prior = prior0.getOrElse(spark.range(nShards)
      .select(col("id").cast("long").as("shard"),
        lit(0L).as("n_docs"), lit(0L).as("token_sum")))
    // the shard load order is O(nShards) — collect it ONCE and rank
    // driver-side (no unpartitioned window, no extra count job), and
    // validate the shard count on the same collected rows: a state dir
    // written for a different shard count cannot be dealt into
    // consistently — fail loudly instead of silently rebalancing
    val loads = prior.select(col("shard"), col("token_sum"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    require(prior0.isEmpty || loads.length == nShards,
      s"state at $statePath does not hold exactly $nShards shards")
    import spark.implicits._
    val order = loads.sortBy { case (sh, ts) => (ts, sh) }.zipWithIndex
      .map { case ((sh, _), i) => (sh, i + 1) }.toSeq
      .toDF("shard", "pos")
    val ranked = Rank.globalRowNumber(base,
      Seq(col("toks").desc, col("id").asc))
    val assigned = ranked
      .withColumn("pos",
        (pmod(col("rn") - 1, lit(nShards.toLong)) + 1).cast("int"))
      .join(broadcast(order), "pos")
      .select(col("id"), col("toks"), col("shard"))
      .localCheckpoint(true) // pin BEFORE the state write (the
                             // incremental-dedup lesson)
    val delta = assigned.groupBy(col("shard"))
      .agg(count(lit(1)).cast("bigint").as("n_docs"),
        sum(col("toks")).cast("bigint").as("token_sum"))
    val merged = prior.unionByName(delta).groupBy(col("shard"))
      .agg(sum(col("n_docs")).cast("bigint").as("n_docs"),
        sum(col("token_sum")).cast("bigint").as("token_sum"))
    StateDir.writeGen(merged.localCheckpoint(true), statePath, batchId)
    assigned
  }

  /** The readStream runner — [[DedupStream]]'s foreachBatch wiring on
    * the shard-dealing modality: per-batch placements land in a
    * per-batch output partition (overwrite = replay-idempotent), the
    * totals fold into state.
    */
  def shardStream(docs: DataFrame, statePath: String, outPath: String,
      checkpoint: String, id: Column, tokens: Column, nShards: Int,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val placed = applyBatch(batch, statePath, id, tokens, nShards,
          batchId)
        placed.write.mode("overwrite").parquet(s"$outPath/batch=$batchId")
        ()
      }
      .start()
}
