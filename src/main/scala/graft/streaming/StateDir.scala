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

  /** GENERATION-addressed state for folds that are neither idempotent
    * nor commutative (the [[ShardStream]]/[[PackStream]] capacity
    * folds — unlike [[CdcStream]]'s max-merge or the dedup streams'
    * append-only tagged rows, applying a batch twice corrupts the
    * capacities): batch `b` READS the newest generation `< b` and
    * WRITES generation `b`, so a crash-replayed batch re-reads the
    * untouched pre-batch generation, recomputes the identical
    * placements, and idempotently overwrites its own generation.
    * Generations older than the one batch `b` read from are pruned
    * after the write (two live generations at any instant).
    */
  def readGenBefore(spark: SparkSession, base: String,
      batchId: Long): Option[DataFrame] =
    latestGenBefore(spark, base, batchId)
      .map(g => spark.read.parquet(s"$base/g$g"))

  private def genIds(spark: SparkSession, base: String): Seq[Long] = {
    val b = new org.apache.hadoop.fs.Path(base)
    val f = fs(spark, b)
    if (!f.exists(b)) Seq.empty
    else f.listStatus(b).toSeq.map(_.getPath.getName)
      .filter(_.matches("g\\d+")).map(_.drop(1).toLong)
  }

  private def latestGenBefore(spark: SparkSession, base: String,
      batchId: Long): Option[Long] = {
    // a generation >= batchId with nothing older means batchIds went
    // BACKWARDS (a new stream against an old state dir) — fail loudly
    // rather than silently starting from scratch
    val ids = genIds(spark, base)
    val prior = ids.filter(_ < batchId)
    require(prior.nonEmpty || ids.isEmpty || ids.forall(_ == batchId),
      s"state at $base holds generations ${ids.sorted.mkString(",")} " +
        s"not before batch $batchId — batch ids must be monotone")
    prior.sorted.lastOption
  }

  /** Schema migration for widened report states: select `cols` from a
    * prior generation, defaulting any column the OLD generation lacks
    * to 0L. A report-state schema that gains a cumulative counter
    * (c_intra_tokens in r17's FunnelStream; c_intra_tokens/c_span in
    * CurateStream) must still resume against a state directory written
    * by the pre-widening code — without this, the resume threw an
    * unresolved-column AnalysisException instead of folding the new
    * counter from 0 (its true pre-widening value: the stage's counts
    * were never accumulated before the stage existed).
    */
  def selectCountersOrZero(df: DataFrame, cols: Seq[String]): DataFrame = {
    val have = df.columns.toSet
    df.select(cols.map(c =>
      if (have(c)) org.apache.spark.sql.functions.col(c)
      else org.apache.spark.sql.functions.lit(0L).as(c)): _*)
  }

  /** Write generation `batchId` (idempotent: a replay overwrites its
    * own generation) and prune generations older than the one it read.
    */
  def writeGen(df: DataFrame, base: String, batchId: Long): Unit = {
    val spark = df.sparkSession
    atomicOverwrite(df, s"$base/g$batchId")
    val keep = latestGenBefore(spark, base, batchId)
    val b = new org.apache.hadoop.fs.Path(base)
    val f = fs(spark, b)
    genIds(spark, base)
      .filter(g => g != batchId && !keep.contains(g))
      .foreach(g => f.delete(new org.apache.hadoop.fs.Path(s"$base/g$g"), true))
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
    // replace-by-RENAME bypasses the write paths Spark hooks to
    // invalidate cached plans/listings over this path (a caller-cached
    // DataFrame would keep resolving the deleted part files —
    // FAILED_READ_FILE.FILE_NOT_EXIST). Invalidate explicitly; plans
    // the CALLER still holds from before the swap must be pinned
    // (localCheckpoint) before calling, as documented above.
    spark.catalog.refreshByPath(path)
  }
}
