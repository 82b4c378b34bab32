package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental CDC apply — [[graft.ext.Cdc.materialize]] run per
  * micro-batch against accumulated state (the foreachBatch companion,
  * like [[DedupStream]] is for near-dup dedup).
  *
  * State holds the WINNING row per pk INCLUDING delete winners as
  * tombstones: a tombstone must outlive its row so late, lower-version
  * events that arrive in a later batch still lose (dropping tombstones
  * would resurrect deleted rows). Readers get the visible state
  * (tombstones filtered). Because each batch merge is the same
  * latest-version-wins max-aggregate, applying batches in ANY order —
  * or re-applying a batch after a crash — converges to the one-shot
  * materialization of the full changelog: idempotent AND
  * commutative, which is exactly what at-least-once delivery needs.
  *
  * Scale shape: per batch, one groupBy(pk) over state ∪ batch — state
  * is bounded by live pks + recent tombstones: passing
  * `tombstoneHorizon` compacts tombstones older than the source's
  * replay horizon at merge time, so tombstone state stays O(churn
  * within the horizon) instead of growing with total deletes forever.
  * State writes are crash-safe via [[StateDir]] replace-by-rename.
  */
object CdcStream {

  /** Merge one changelog micro-batch into `statePath`; returns the
    * VISIBLE state (tombstones filtered) after the merge.
    *
    * `tombstoneHorizon`, when set, drops tombstones whose version is
    * more than `h` behind the max version in state. This is safe
    * exactly when the source cannot replay events that far back (the
    * standard changelog-retention contract): a dropped tombstone only
    * matters if a lower-versioned event for that pk arrives later, and
    * the horizon guarantees it never will. `None` keeps every
    * tombstone (the safe default when retention is unknown).
    */
  def applyBatch(batch: DataFrame, statePath: String, pkCol: String,
      versionCol: String, opCol: String,
      tombstoneHorizon: Option[Long] = None): DataFrame = {
    val spark = batch.sparkSession
    // Only path-absent means "no prior": a corrupted/transiently-
    // unreadable state dir must fail the batch, not silently reset
    // state (and resurrect deleted rows). StateDir probes existence.
    val prior = StateDir.readPrior(spark, statePath)
    val all = prior.fold(batch)(p => p.unionByName(batch))
    // keep tombstones: aggregate WITHOUT the delete filter
    val payloadCols = batch.columns.toSeq
      .filterNot(c => c == pkCol || c == versionCol || c == opCol)
    val packed = struct(
      (col(versionCol).as("_ver") +: col(opCol).as("_op") +:
        payloadCols.map(col)): _*)
    val merged = all.groupBy(col(pkCol)).agg(max(packed).as("_w"))
      .select((col(pkCol) +: col("_w._ver").as(versionCol) +:
        col("_w._op").as(opCol) +: payloadCols.map(c => col(s"_w.$c").as(c))): _*)
    val compacted = tombstoneHorizon.fold(merged) { h =>
      merged
        .crossJoin(broadcast(
          merged.agg(max(col(versionCol).cast("long")).as("_maxv"))))
        .filter(col(opCol) =!= "delete" ||
          col(versionCol).cast("long") >= col("_maxv") - h)
        .drop("_maxv")
    }
    // pin eagerly: the lazy plan reads the dir the swap will replace
    val next = compacted.localCheckpoint(true)
    StateDir.atomicOverwrite(next, statePath)
    next.filter(col(opCol) =!= "delete")
  }
}
