package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ext.Geo

/** Continuous proximity monitoring — the streaming face of
  * [[graft.ext.Geo.radiusPairsAgainstHistory]] (the foreachBatch
  * companion, same protocol as [[CusumStream]]/[[AnomalyStream]]):
  * each micro-batch of points reports the in-radius pairs it
  * INTRODUCES — batch-internal plus new-vs-accumulated-history — and
  * is then appended to the state, so across any batch split every
  * pair is reported exactly once (the geofence/proximity-alert
  * contract; `Geo.radiusPairsAgainstHistory`'s composition property,
  * proven in GeoSpec, is exactly what makes the split-invariance
  * hold).
  *
  * Scale shape: per batch, the neighbor-cell equi-join of the batch
  * against state; the history leg ships only the cells the batch's
  * probe keys touch. With `ageHorizon` set, state is bounded by the
  * points seen within the horizon (the alert window) instead of
  * growing forever; production additionally buckets the stored
  * history by cell id so probes co-locate without reshuffling.
  */
object GeoStream {

  /** Report the pairs this point micro-batch introduces, then fold the
    * batch into the state at `statePath` (crash-safe replace-by-
    * rename). Input schema: (id, lat_micro, lon_micro[, ts]).
    *
    * `ageHorizon`, when set, requires a `ts` column (event time, any
    * monotone numeric unit — epoch seconds, millis, a batch epoch) and
    * drops state points with `ts < max(ts in merged state) − horizon`
    * after each merge — the watermark discipline: a point older than
    * the alert horizon can never participate in a new alert, so
    * keeping it only grows the join's history leg. `None` keeps every
    * point (the prior behavior; safe when the feed is bounded).
    *
    * State-schema migration: a state directory written before aging
    * was enabled (no `ts` column) is accepted — its rows get a null
    * `ts` and age as if first seen in the current batch; and a state
    * that HAS `ts` keeps it even when a later batch omits the column.
    */
  def applyBatch(batch: DataFrame, statePath: String,
      radiusMicro: Long, ageHorizon: Option[Long] = None): DataFrame = {
    val spark = batch.sparkSession
    val hasTs = batch.columns.contains("ts")
    require(ageHorizon.isEmpty || hasTs,
      "ageHorizon requires a ts column on the batch")
    val keep =
      if (hasTs) Seq("id", "lat_micro", "lon_micro", "ts")
      else Seq("id", "lat_micro", "lon_micro")
    val pts = batch.select(keep.map(col): _*)
    // reconcile the PRIOR state's schema to the batch's instead of
    // blind-selecting the batch columns: a pre-aging state directory
    // (written without ts) would make select("ts") throw when aging is
    // enabled later, and a ts-less batch against ts-bearing state
    // would silently strip ts from the persisted state, permanently
    // disabling aging. Migration rule: prior rows missing ts get a
    // null ts (aged as current — see coalesce below); prior ts is
    // PRESERVED even when the batch lacks the column (batch rows then
    // carry null ts, also aged as current).
    val prior0 = StateDir.readPrior(spark, statePath)
    val keepAll =
      if (hasTs) keep
      else Seq("id", "lat_micro", "lon_micro") ++
        (if (prior0.exists(_.columns.contains("ts"))) Seq("ts") else Nil)
    def conform(df: DataFrame): DataFrame =
      df.select(keepAll.map(c =>
        if (df.columns.contains(c)) col(c)
        else lit(null).cast("long").as(c)): _*)
    val prior = prior0.map(conform)
    val pairs = Geo.radiusPairsAgainstHistory(
      pts.select("id", "lat_micro", "lon_micro"),
      prior.getOrElse(pts.limit(0))
        .select("id", "lat_micro", "lon_micro"),
      radiusMicro)
      .localCheckpoint(true) // pin BEFORE the state write (the
                             // incremental-dedup lesson: a lazy plan
                             // read later would see its own batch in
                             // state and double-report)
    // dropDuplicates over the full row: an at-least-once REDELIVERED
    // batch re-unions identical point rows, and each state copy would
    // pair (and alert) separately against every future batch; exact
    // duplicates carry no information, while a genuinely moved point
    // (same id, new coords/ts) still keeps its full position history.
    val merged0 = prior.fold(conform(pts))(p => p.unionByName(conform(pts)))
      .dropDuplicates(keepAll)
    // a NULL-ts row whose (id, coords) already has a ts-bearing copy
    // is content-free: it is either an at-least-once REDELIVERY of a
    // row the aging fold already anchored (possibly several batches
    // ago — by now anchored to an OLDER max ts than today's, so no
    // row-level dedup can ever collapse the pair), or a ts-less
    // re-sighting that adds no event time. Anti-joining it out keeps
    // state at one row per (id, coords, ts) and stops the duplicate
    // from pairing/alerting separately and silently extending the
    // point's expiry. A genuinely NEW ts-less point (no ts-bearing
    // coords match) survives and anchors as before.
    val merged =
      if (!keepAll.contains("ts")) merged0
      else {
        val tsful = merged0.filter(col("ts").isNotNull)
        // only twins that will SURVIVE this batch's aging cut count:
        // if the sole ts-bearing copy is about to expire, the null-ts
        // observation is the point's liveness ("aged as seen NOW") and
        // must be kept to re-anchor — anti-joining against the raw
        // twin set would vanish the point in the same batch it was
        // observed. Without aging nothing expires, so any twin makes
        // the null row content-free.
        val twins = ageHorizon match {
          case Some(h) => tsful
            .crossJoin(broadcast(merged0.agg(max(col("ts")).as("_mx"))))
            .filter(col("_mx").isNull || col("ts") >= col("_mx") - h)
            .select("id", "lat_micro", "lon_micro")
          case None => tsful.select("id", "lat_micro", "lon_micro")
        }
        val tsless = merged0.filter(col("ts").isNull)
          .join(twins.distinct(),
            Seq("id", "lat_micro", "lon_micro"), "left_anti")
        tsful.unionByName(tsless)
      }
    // age-out AFTER pairing: a point expiring in this batch still
    // paired against the batch (it was within horizon when it mattered).
    // coalesce(ts, _maxt): a migrated pre-aging state row (null ts) is
    // aged as if seen NOW — it survives one full horizon from the
    // batch that enabled aging, then expires unless re-sighted; the
    // alternative (expire-immediately) would silently drop the whole
    // migrated history in the first aged batch
    // _maxt.isNull guard: if EVERY row's ts is null (migrated pre-aging
    // state + an empty or ts-less first aged batch), max(ts) is NULL
    // and the >= comparison would be NULL for every row — silently
    // wiping the whole migrated history. No observed event time means
    // nothing can be declared stale: keep everything.
    // null-ts rows are aged as seen NOW — and that anchor is
    // MATERIALIZED (ts := max observed ts) before the state write:
    // leaving ts null would re-anchor the row to the advancing max on
    // every later batch, so migrated history would never expire and
    // state would grow without bound
    val aged = ageHorizon.fold(merged) { h =>
      merged
        .crossJoin(broadcast(merged.agg(max(col("ts")).as("_maxt"))))
        .filter(col("_maxt").isNull ||
          coalesce(col("ts"), col("_maxt")) >= col("_maxt") - h)
        .withColumn("ts", coalesce(col("ts"), col("_maxt")))
        .drop("_maxt")
      // no post-anchor dedup needed: the null-ts anti-join above
      // already removed every row that could become identical to a
      // ts-bearing copy once anchored (and surviving null-ts rows have
      // no ts-bearing (id, coords) twin BY CONSTRUCTION)
    }
    StateDir.atomicOverwrite(aged.localCheckpoint(true), statePath)
    pairs
  }

  /** The readStream runner — [[graft.streaming.DedupStream]]'s
    * foreachBatch wiring on the proximity modality: each micro-batch's
    * alerts land in a per-batch output partition (overwrite = replay-
    * idempotent writes), the batch folds into the aged point state.
    */
  def proximityStream(points: org.apache.spark.sql.DataFrame,
      statePath: String, outPath: String, checkpoint: String,
      radiusMicro: Long, ageHorizon: Option[Long] = None,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    points.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch {
        (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
          val alerts = applyBatch(batch, statePath, radiusMicro, ageHorizon)
          alerts.write.mode("overwrite").parquet(s"$outPath/batch=$batchId")
          ()
      }
      .start()
}
