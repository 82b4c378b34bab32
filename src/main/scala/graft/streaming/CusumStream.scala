package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ext.TimeSeries

/** Continuous CUSUM changepoint monitoring —
  * [[graft.ext.TimeSeries.cusumFromDaily]] run per micro-batch against
  * accumulated daily sums (the foreachBatch companion, same protocol
  * as [[AnomalyStream]]).
  *
  * State holds one row per (group, day) with its EXACT decimal value
  * sum. Merging a batch is a pure decimal ADD per key — convergent
  * under any batch split of the feed (the spec's contract), and
  * crash-safe via [[StateDir]]'s replace-by-rename. Because CUSUM is
  * mean-relative, each batch re-evaluates the statistic over the full
  * accumulated series (the mean and the alarm flags of EARLIER days
  * legitimately move as the baseline grows — this is the
  * retrospective "monitor the whole history" face; a fixed-reference
  * production deployment would freeze μ from a calibration window,
  * which drops the recompute to the open day only).
  *
  * Scale shape: state is bounded by groups × active days; the
  * per-batch detector runs per-group windows over O(days) rows.
  * Production would age out days beyond the monitoring horizon.
  */
object CusumStream {

  /** Merge one event micro-batch into the daily-sum state at
    * `statePath`, then return CUSUM scores + alarms over the merged
    * series — identical to running [[graft.ext.TimeSeries.cusum]]
    * over all events seen so far.
    */
  /** `horizonDays`, when set, compacts state to the trailing
    * `horizonDays` calendar days behind the max day seen ACROSS ALL
    * groups (global watermark — a group that stops emitting ages out
    * instead of pinning its days forever). The statistic then monitors
    * the horizon window rather than all history: alarms for retained
    * days are exact w.r.t. that window (CUSUM is mean-relative, so a
    * truncated baseline is a DIFFERENT, deliberately-chosen reference
    * — the "monitoring horizon" a production deployment wants anyway).
    * `None` keeps every day (the prior behavior).
    */
  def applyBatch(batch: DataFrame, statePath: String, groupCol: String,
      tsCol: String, valueCol: String, slack: BigDecimal,
      threshold: BigDecimal, horizonDays: Option[Int] = None): DataFrame = {
    val spark = batch.sparkSession
    val prior = StateDir.readPrior(spark, statePath)
    val inc = batch
      .groupBy(col(groupCol).as("grp"),
        date_format(col(tsCol), "yyyy-MM-dd").as("day"))
      .agg(sum(col(valueCol).cast("decimal(10,2)")).cast("decimal(12,2)")
        .as("x"))
    val summed = prior.fold(inc)(p => p.unionByName(inc))
      .groupBy(col("grp"), col("day"))
      .agg(sum(col("x")).cast("decimal(12,2)").as("x"))
    val aged = horizonDays.fold(summed) { h =>
      summed
        .crossJoin(broadcast(summed.agg(max(col("day")).as("_maxd"))))
        .filter(datediff(to_date(col("_maxd")), to_date(col("day"))) < h)
        .drop("_maxd")
    }
    val merged = aged.localCheckpoint(true)
    StateDir.atomicOverwrite(merged, statePath)
    TimeSeries.cusumFromDaily(merged, slack, threshold)
  }
}
