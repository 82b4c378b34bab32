package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Crash-safe parquet state directory for the foreachBatch stateful
  * operators ([[CdcStream]], [[AnomalyStream]]): replace-by-rename, the
  * same discipline as `io/Sink.compact`. A direct
  * `SaveMode.Overwrite` on the live dir deletes before it commits, so a
  * crash mid-write loses the accumulated state; writing to a `__tmp`
  * sibling and swapping via two renames leaves, at every instant,
  * either the complete old state, the complete new state, or an
  * `__old` backup that [[readPrior]] restores on the next batch.
  */
object StateDir {

  private def fs(spark: SparkSession, p: org.apache.hadoop.fs.Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Read the prior state at `path` if any. If a crash left the state
    * mid-swap (live dir missing but `__old` backup present), restore
    * the backup first — the interrupted batch then simply replays.
    */
  def readPrior(spark: SparkSession, path: String): Option[DataFrame] = {
    val live = new org.apache.hadoop.fs.Path(path)
    val bak = new org.apache.hadoop.fs.Path(path + "__old")
    val f = fs(spark, live)
    if (!f.exists(live) && f.exists(bak) && !f.rename(bak, live))
      throw new java.io.IOException(s"state: cannot restore backup $bak")
    // Only path-absent means "no prior": a corrupted/transiently-
    // unreadable dir must fail the batch, not silently reset state.
    if (f.exists(live)) Some(spark.read.parquet(path)) else None
  }

  /** Atomically replace the state at `path` with `df`. The caller must
    * have pinned `df` (localCheckpoint) if its plan reads `path`.
    */
  def atomicOverwrite(df: DataFrame, path: String): Unit = {
    val spark = df.sparkSession
    val live = new org.apache.hadoop.fs.Path(path)
    val tmp = new org.apache.hadoop.fs.Path(path + "__tmp")
    val bak = new org.apache.hadoop.fs.Path(path + "__old")
    val f = fs(spark, live)
    f.delete(tmp, true)
    df.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    f.delete(bak, true)
    if (f.exists(live) && !f.rename(live, bak))
      throw new java.io.IOException(s"state: cannot move $path aside")
    if (!f.rename(tmp, live)) {
      if (f.exists(bak)) f.rename(bak, live) // restore
      throw new java.io.IOException(s"state: cannot swap in new $path")
    }
    f.delete(bak, true)
  }
}
