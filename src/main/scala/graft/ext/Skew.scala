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
}
