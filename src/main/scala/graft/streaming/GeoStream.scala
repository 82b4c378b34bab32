package graft.streaming

import org.apache.spark.sql.DataFrame
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
  * probe keys touch. State grows by the batch's points; production
  * buckets the stored history by cell id (probes co-locate without
  * reshuffling) and ages out points beyond the alert horizon.
  */
object GeoStream {

  /** Report the pairs this point micro-batch introduces, then fold the
    * batch into the state at `statePath` (crash-safe replace-by-
    * rename). Input schema: (id, lat_micro, lon_micro).
    */
  def applyBatch(batch: DataFrame, statePath: String,
      radiusMicro: Long): DataFrame = {
    val spark = batch.sparkSession
    val pts = batch.select("id", "lat_micro", "lon_micro")
    val prior = StateDir.readPrior(spark, statePath)
      .map(_.select("id", "lat_micro", "lon_micro"))
    val pairs = Geo.radiusPairsAgainstHistory(
      pts, prior.getOrElse(pts.limit(0)), radiusMicro)
      .localCheckpoint(true) // pin BEFORE the state write (the
                             // incremental-dedup lesson: a lazy plan
                             // read later would see its own batch in
                             // state and double-report)
    StateDir.atomicOverwrite(
      prior.fold(pts)(p => p.unionByName(pts)).localCheckpoint(true),
      statePath)
    pairs
  }
}
