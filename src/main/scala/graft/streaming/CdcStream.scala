package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import graft.ext.Cdc

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
  * is bounded by live pks + tombstones (production compacts tombstones
  * past the source's replay horizon; noted, not implemented).
  */
object CdcStream {

  /** Merge one changelog micro-batch into `statePath`; returns the
    * VISIBLE state (tombstones filtered) after the merge.
    */
  def applyBatch(batch: DataFrame, statePath: String, pkCol: String,
      versionCol: String, opCol: String): DataFrame = {
    val spark = batch.sparkSession
    // Probe existence explicitly rather than Try(...).toOption: swallowing
    // ALL read failures would treat a corrupted/transiently-unreadable
    // state dir as empty prior state, resetting accumulated state (and
    // resurrecting deleted rows). Only path-absent means "no prior".
    val hPath = new org.apache.hadoop.fs.Path(statePath)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val prior =
      if (fs.exists(hPath)) Some(spark.read.parquet(statePath)) else None
    val all = prior.fold(batch)(p => p.unionByName(batch))
    // keep tombstones: aggregate WITHOUT the delete filter
    val payloadCols = batch.columns.toSeq
      .filterNot(c => c == pkCol || c == versionCol || c == opCol)
    val packed = struct(
      (col(versionCol).as("_ver") +: col(opCol).as("_op") +:
        payloadCols.map(col)): _*)
    // pin eagerly before overwriting the directory the plan reads from
    val next = all.groupBy(col(pkCol)).agg(max(packed).as("_w"))
      .select((col(pkCol) +: col("_w._ver").as(versionCol) +:
        col("_w._op").as(opCol) +: payloadCols.map(c => col(s"_w.$c").as(c))): _*)
      .localCheckpoint(true)
    next.write.mode(SaveMode.Overwrite).parquet(statePath)
    next.filter(col(opCol) =!= "delete")
  }
}
