package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ext.Stats

/** Continuous anomaly monitoring — [[graft.ext.Stats.rollingAnomalies]]
  * run per micro-batch against accumulated daily counts (the
  * foreachBatch companion, like [[CdcStream]] is for CDC apply).
  *
  * State holds one row per (group, day) with its event count. Merging
  * a batch is a pure integer ADD per key, which is idempotent-safe
  * under replay ONLY with exactly-once batch semantics (foreachBatch +
  * checkpoint, as everywhere in this layer) — counts, unlike
  * [[CdcStream]]'s max-merge, are not naturally re-applicable, so the
  * state write and the checkpoint commit must be atomic per epoch;
  * the spec covers the convergence contract (any batch SPLIT of the
  * feed yields the one-shot flags), not at-least-once replay. The
  * state write itself is crash-safe via [[StateDir]]'s
  * replace-by-rename: an interrupt mid-write leaves the old state (or
  * a restorable backup) intact, never a half-written dir.
  *
  * Scale shape: per batch, one groupBy over state ∪ batch increments
  * keyed on (group, day) — state is bounded by groups × active days,
  * and production would age out days beyond the trailing window plus
  * the late-data horizon.
  */
object AnomalyStream {

  /** Merge one event micro-batch into the daily-count state at
    * `statePath`, then return the anomaly flags over the merged
    * counts — identical to running the batch detector over all events
    * seen so far.
    */
  /** `horizonDays`, when set, compacts state to the trailing
    * `horizonDays` days behind the global max day (the [[CusumStream]]
    * watermark discipline). Choose `horizonDays ≥ win + late-data
    * horizon`: flags for days at least `win` days inside the retained
    * window are identical to the unbounded run (the trailing-window
    * detector only looks back `win` days), while days within `win` of
    * the cut see a truncated baseline — the standard cold-start edge,
    * now at the compaction boundary. `None` keeps every day.
    */
  def applyBatch(batch: DataFrame, statePath: String, groupCol: String,
      tsCol: String, win: Int = 7, k: Int = 3,
      horizonDays: Option[Int] = None): DataFrame = {
    val spark = batch.sparkSession
    val prior = StateDir.readPrior(spark, statePath)
    val inc = batch
      .groupBy(col(groupCol).as("grp"),
        date_format(col(tsCol), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("cnt"))
    val summed = prior.fold(inc)(p => p.unionByName(inc))
      .groupBy(col("grp"), col("day"))
      .agg(sum(col("cnt")).as("cnt"))
    val aged = horizonDays.fold(summed) { h =>
      summed
        .crossJoin(broadcast(summed.agg(max(col("day")).as("_maxd"))))
        .filter(datediff(to_date(col("_maxd")), to_date(col("day"))) < h)
        .drop("_maxd")
    }
    val merged = aged.localCheckpoint(true)
    StateDir.atomicOverwrite(merged, statePath)
    Stats.rollingAnomaliesFromDaily(merged, win, k)
  }
}
