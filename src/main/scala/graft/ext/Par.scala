package graft.ext

import org.apache.spark.sql.{Column, DataFrame}

/** Scan-parallelism floor (r19 optimization).
  *
  * Parquet inputs parallelize at ROW-GROUP granularity: a file with one
  * row group yields one non-empty scan task no matter how small
  * `spark.sql.files.maxPartitionBytes` is set, so every narrow pass
  * before the first exchange (tokenize/explode/decode/pair-generation
  * after a broadcast join) runs on ONE core. The bench fixtures are all
  * single-row-group files, and a real corpus can be under-split the
  * same way (few huge row groups, gzip'd text, a hot single file).
  *
  * `spread` raises the floor: if the source scan yields fewer
  * partitions than half the session's shuffle parallelism, repartition
  * by a DETERMINISTIC key (guide §2.5 — never rand-derived) so the
  * multi-pass compute downstream sees the full core count; a
  * WELL-SPLIT input returns unchanged and pays nothing. The exchange
  * this inserts moves the table once (narrow columns, before any
  * expansion), which is amortized by the many passes the callers make.
  *
  * ONLY call this on scan-level inputs (a raw `H.t` load plus narrow
  * projections/filters): the partition probe builds the input's RDD,
  * and under AQE an input that already contains exchanges would
  * EXECUTE its upstream stages at probe time (AdaptiveSparkPlanExec
  * materializes non-result stages inside `.rdd`) — mid-pipeline inputs
  * must not be probed.
  */
object Par {
  def spread(df: DataFrame, key: Column): DataFrame = {
    val want = df.sparkSession.sessionState.conf.numShufflePartitions
    val have = df.rdd.getNumPartitions
    if (2 * have >= want) df else df.repartition(key)
  }
}
