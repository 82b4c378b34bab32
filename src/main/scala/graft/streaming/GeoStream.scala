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
    val prior = StateDir.readPrior(spark, statePath)
      .map(_.select(keep.map(col): _*))
    val pairs = Geo.radiusPairsAgainstHistory(
      pts.select("id", "lat_micro", "lon_micro"),
      prior.getOrElse(pts.limit(0))
        .select("id", "lat_micro", "lon_micro"),
      radiusMicro)
      .localCheckpoint(true) // pin BEFORE the state write (the
                             // incremental-dedup lesson: a lazy plan
                             // read later would see its own batch in
                             // state and double-report)
    val merged = prior.fold(pts)(p => p.unionByName(pts))
    // age-out AFTER pairing: a point expiring in this batch still
    // paired against the batch (it was within horizon when it mattered)
    val aged = ageHorizon.fold(merged) { h =>
      merged
        .crossJoin(broadcast(merged.agg(max(col("ts")).as("_maxt"))))
        .filter(col("ts") >= col("_maxt") - h)
        .drop("_maxt")
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
