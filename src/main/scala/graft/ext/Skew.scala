package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation helpers (SURVEY.md north star: "salting for skew").
  *
  * AQE's skew-join handling covers sort-merge joins at runtime; these
  * helpers cover the cases it doesn't: hot-key aggregation (a single
  * giant group lands on one task regardless of AQE) and broadcast-free
  * skewed joins. Both are deterministic — the salt is a hash of stable
  * columns, not a random number, so results are reproducible and
  * retries are safe.
  */
object Skew {

  /** Deterministic salt in [0, buckets) from stable columns. */
  def salt(buckets: Int, cols: Column*): Column =
    pmod(xxhash64(cols: _*), lit(buckets)).cast("int")

  /** Two-phase salted aggregation: groupBy (key, salt) computes partial
    * aggregates (splitting a hot key across `buckets` tasks), then the
    * tiny per-salt partials are combined per key. Caller provides the
    * partial aggs and the matching combiners keyed by output name.
    *
    * Example: sums and counts re-aggregate with sum(); min/max with
    * min()/max().
    */
  def saltedAgg(
      df: DataFrame,
      key: Column,
      saltSource: Seq[Column],
      buckets: Int,
      partials: Seq[Column],
      combine: Seq[Column]): DataFrame =
    df.withColumn("_salt", salt(buckets, saltSource: _*))
      .groupBy(key.as("_key"), col("_salt"))
      .agg(partials.head, partials.tail: _*)
      .groupBy(col("_key"))
      .agg(combine.head, combine.tail: _*)

  /** Salted shuffle join for a skewed fact against a non-broadcastable
    * dim: the fact side gets a deterministic salt in [0, buckets); the
    * dim side is replicated `buckets` times (explode of a literal
    * range); the join key becomes (key, salt), splitting each hot key's
    * rows across `buckets` reducers.
    */
  def saltedJoin(
      fact: DataFrame, dim: DataFrame,
      factKey: String, dimKey: String,
      saltSource: Seq[Column], buckets: Int): DataFrame = {
    val saltedFact = fact.withColumn("_salt", salt(buckets, saltSource: _*))
    val replicatedDim = dim.withColumn("_salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    saltedFact.join(replicatedDim,
      saltedFact(factKey) === replicatedDim(dimKey) &&
        saltedFact("_salt") === replicatedDim("_salt"))
      .drop("_salt")
  }

  /** Top-key skew report for a join/aggregation key: the topK hottest
    * values with their absolute counts, share of all rows, and the
    * running (cumulative) share — the measurement that DECIDES whether
    * [[salt]]/[[saltedJoin]] or an AQE skew hint is warranted before a
    * shuffle is planned. A top key holding >1/shuffle-partitions of
    * the rows is the task that straggles.
    *
    * Scale shape: one map-side-combinable key count, a TakeOrdered
    * topK (never a global sort), and a topK-row window.
    */
  def topKeyReport(df: DataFrame, key: Column, topK: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = df.groupBy(key.as("key"))
      .agg(count(lit(1)).as("n"))
    val tot = counts.agg(sum(col("n")).as("total"),
      count(lit(1)).as("n_keys"))
    // constant-valued-but-not-foldable partition spec: the (deliberate,
    // topK-row) single partition stays explicit instead of degrading to
    // the accidental-global-window warning; xxhash64 keeps it type-generic
    val w = Window.partitionBy(pmod(xxhash64(col("key")), lit(1)))
      .orderBy(col("n").desc, col("key"))
    val top = counts.orderBy(col("n").desc, col("key")).limit(topK)
      .withColumn("rank", row_number().over(w))
    top.crossJoin(broadcast(tot))
      .withColumn("share", col("n").cast("double") / col("total").cast("double"))
      .withColumn("cum_share", sum(col("share"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("rank").cast("bigint").as("rank"), col("key"),
        col("n").cast("bigint").as("n"),
        col("n_keys").cast("bigint").as("n_keys"),
        col("share"), col("cum_share"))
  }
}
