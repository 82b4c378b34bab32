package graft.ext

import org.apache.spark.sql.DataFrame

/** Lineage pinning for iterative fixed-point loops (PageRank, label
  * propagation, k-core peeling, Lloyd's k-means, farthest-point
  * sampling, BPE rounds): each round must cut its plan or the lineage
  * snowballs into an exponential re-execution graph.
  *
  * Default is `localCheckpoint(eager = true)` — fast (executor-local
  * storage, no DFS round-trip), but NOT fault-tolerant: a lost
  * executor loses partitions that can no longer be recomputed, failing
  * the job. On a long-lived 1000-executor cluster, where executor
  * churn is routine, opt into RELIABLE `checkpoint()` instead:
  *
  * {{{
  * spark.sparkContext.setCheckpointDir("hdfs://…/checkpoints")
  * spark.conf.set("spark.graft.reliableCheckpoint", "true")
  * }}}
  *
  * Reliable checkpoints write partitions to the checkpoint dir (HDFS/
  * object store), surviving any executor loss at the cost of one DFS
  * write+read per round. Results are bit-identical either way — the
  * spec proves it — only the storage medium changes.
  */
object Iter {

  /** The session flag selecting reliable `checkpoint()` over
    * `localCheckpoint()` for per-round pins.
    */
  val ReliableFlag = "spark.graft.reliableCheckpoint"

  /** Eagerly pin `df` for iterative reuse, honoring [[ReliableFlag]].
    * With the flag set, `SparkContext.setCheckpointDir` must have been
    * called (Spark raises its own clear error otherwise).
    */
  def pin(df: DataFrame): DataFrame =
    if (df.sparkSession.conf.get(ReliableFlag, "false").toBoolean)
      df.checkpoint(eager = true)
    else
      df.localCheckpoint(eager = true)
}
