package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental whole-document sequence packing — the streaming face of
  * [[graft.ext.Sampling.packBestFit]] (the foreachBatch companion,
  * same state protocol as [[ShardStream]]): each micro-batch's docs
  * continue the best-fit-decreasing packing from the PERSISTED
  * per-group OPEN bins, so a corpus arriving over many batches still
  * packs into tight whole-document bins without repacking what was
  * already laid out (placed docs never move; bins that fill NEVER
  * reopen — they can be shipped as soon as the batch commits).
  *
  * Policy per batch (identical to the batch face, continued): batch
  * docs in (tokens DESC, id) order; each goes to the OPEN bin with the
  * smallest remaining ≥ tokens (ties → lowest bin id), else opens a
  * new bin at the group's next id; oversize docs (tokens > seqLen)
  * take dedicated trailing ids with zero remaining (never refilled).
  * Note the stream is NOT equivalent to one-shot BFD over the union —
  * BFD is order-sensitive and the stream honors arrival order batch by
  * batch (the price of never repacking); within any single batch it IS
  * exact BFD given the inherited bins.
  *
  * State: one row per OPEN bin (group, bin, remaining > 0) plus a
  * per-group next-bin counter row — full bins leave state immediately,
  * so state size is bounded by open bins (BFD keeps few per group),
  * not by corpus size. Crash-safe via [[StateDir]] replace-by-rename.
  *
  * Scale shape: one shuffle on group (state rows ride along), the same
  * per-group in-memory stream as the batch face, then O(placements)
  * aggregation to fold remaining capacities — a group is a PACKER
  * SHARD (compose with [[ShardStream]] upstream).
  */
object PackStream {

  private val CtrKind = "ctr"
  private val OpenKind = "open"

  /** Pack one document micro-batch against the bin state at
    * `statePath`; returns this batch's per-doc placements
    * (group, doc_id, toks, bin, n_bins).
    */
  def applyBatch(batch: DataFrame, statePath: String, group: Column,
      id: Column, tokens: Column, seqLen: Long,
      batchId: Long = 0L): DataFrame = {
    require(seqLen > 0, "seqLen must be positive")
    val spark = batch.sparkSession
    import spark.implicits._
    val docs = batch.select(group.cast("string").as("g"),
      id.cast("long").as("id"), tokens.cast("long").as("toks"))
    val prior = StateDir.readGenBefore(spark, statePath, batchId)
    val priorDf = prior.getOrElse(
      Seq.empty[(String, Long, Long, String)]
        .toDF("g", "bin", "remaining", "kind"))
    // one per-group stream sees state AND docs: tag 0 = open bin
    // (a = bin, b = remaining), 1 = counter (b = next bin id),
    // 2 = doc (a = id, b = toks)
    val tagged = priorDf.select(col("g"),
        when(col("kind") === CtrKind, lit(1)).otherwise(lit(0)).as("tag"),
        col("bin").as("a"), col("remaining").as("b"))
      .unionByName(docs.select(col("g"), lit(2).as("tag"),
        col("id").as("a"), col("toks").as("b")))
      .as[(String, Int, Long, Long)]
    val placed = tagged.groupByKey(_._1).flatMapGroups { (g, it) =>
      val items = it.toArray
      val open = items.iterator.filter(_._2 == 0)
        .map(r => (r._4, r._3)).toSeq // (remaining, bin)
      val next = items.iterator.filter(_._2 == 1)
        .map(_._4).foldLeft(0L)(math.max)
      val ds = items.filter(_._2 == 2).map(r => (r._3, r._4))
      // the SHARED policy kernel (Sampling.bfdPlace) — the stream is
      // exact BFD within the batch given the inherited bins, provably
      // in lockstep with the batch face
      graft.ext.Sampling.bfdPlace(ds, seqLen, open, next)
        .iterator.map { case (docId, t, bin, n) => (g, docId, t, bin, n) }
    }.toDF("g", "doc_id", "toks", "bin", "n_bins")
      .localCheckpoint(true) // pin BEFORE the state write (the
                             // incremental-dedup lesson)
    // fold the placements into the state OUTSIDE the group stream:
    // per touched small bin, remaining' = (prior remaining | seqLen
    // for a new bin) − Σ placed tokens; full bins (remaining' = 0)
    // leave state; dedicated oversize bins never enter it; the
    // counter advances to max(bin + n_bins)
    // null-safe (<=>) state-fold joins: a NULL group key is a legal
    // group to groupByKey, but a plain equi-join would never match its
    // prior and placed rows, duplicating the bin's state with
    // inconsistent capacities (and over-filling it next batch)
    val placedPerBin = placed.filter(col("n_bins") === 1L)
      .groupBy(col("g"), col("bin"))
      .agg(sum(col("toks")).as("placed"))
    val priorOpen = priorDf.filter(col("kind") === OpenKind)
      .select(col("g"), col("bin"), col("remaining"))
    val opens = priorOpen.as("p")
      .join(placedPerBin.as("q"),
        col("p.g") <=> col("q.g") && col("p.bin") <=> col("q.bin"),
        "full_outer")
      .select(coalesce(col("p.g"), col("q.g")).as("g"),
        coalesce(col("p.bin"), col("q.bin")).as("bin"),
        (coalesce(col("p.remaining"), lit(seqLen)) -
          coalesce(col("q.placed"), lit(0L))).as("remaining"))
      .filter(col("remaining") > 0L)
      .select(col("g"), col("bin"), col("remaining"),
        lit(OpenKind).as("kind"))
    val priorCtr = priorDf.filter(col("kind") === CtrKind)
      .select(col("g"), col("remaining").as("c0"))
    val ctr = placed
      .groupBy(col("g"))
      .agg(max(col("bin") + col("n_bins")).as("c1"))
      .as("n")
      .join(priorCtr.as("p"), col("n.g") <=> col("p.g"), "full_outer")
      .select(coalesce(col("n.g"), col("p.g")).as("g"),
        lit(-1L).as("bin"),
        greatest(coalesce(col("c0"), lit(0L)),
          coalesce(col("c1"), lit(0L))).as("remaining"),
        lit(CtrKind).as("kind"))
    StateDir.writeGen(
      opens.unionByName(ctr).localCheckpoint(true), statePath, batchId)
    placed.select(col("g").as("group"), col("doc_id"), col("toks"),
      col("bin"), col("n_bins"))
  }

  /** The readStream runner — [[DedupStream]]'s foreachBatch wiring on
    * the packing modality: per-batch placements land in a per-batch
    * output partition (overwrite = replay-idempotent), capacities fold
    * into state.
    */
  def packStream(docs: DataFrame, statePath: String, outPath: String,
      checkpoint: String, group: Column, id: Column, tokens: Column,
      seqLen: Long,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val placed = applyBatch(batch, statePath, group, id, tokens,
          seqLen, batchId)
        placed.write.mode("overwrite").parquet(s"$outPath/batch=$batchId")
        ()
      }
      .start()
}
