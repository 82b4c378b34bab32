package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared helpers for the oracle-differential query surface.
  *
  * Determinism rules (driver hash is type- AND value-sensitive):
  *   - Aggregation over floating-point inputs goes through DECIMAL casts:
  *     decimal addition is exact and order-independent, so any Spark
  *     partitioning produces bit-identical sums to DuckDB.
  *   - Spark widens SUM(DECIMAL(p,s)) to p+10 while DuckDB widens to 38;
  *     every final decimal aggregate is cast to DECIMAL(38,s).
  *   - Averages = CAST(exact decimal SUM AS DOUBLE) / COUNT in BOTH
  *     engines: double division of identical operands is IEEE-identical.
  *   - COUNT → BIGINT on both sides; DuckDB SUM(BIGINT) is HUGEINT, so
  *     integer sums are CAST(... AS BIGINT) in the oracle.
  */
object H {
  /** Cast a clean double column to decimal(10,2) BEFORE any arithmetic.
    * On 2-decimal generated data, Spark (shortest-string) and DuckDB
    * (exact-binary) double→decimal rounding agree.
    */
  def dec2(c: Column): Column = c.cast("decimal(10,2)")
  val one2: Column = lit(1).cast("decimal(10,2)")

  /** Exact decimal sum, widened to DuckDB's SUM output type. */
  def sum38(c: Column, scale: Int, name: String): Column =
    sum(c).cast(s"decimal(38,$scale)").as(name)

  /** Order-independent average: exact decimal sum → double → divide. */
  def avgViaDec(c: Column, name: String): Column =
    (sum(dec2(c)).cast("double") / count(lit(1))).as(name)

  /** TPC-H style revenue term: extendedprice * (1 - discount), exact. */
  def revenue(price: Column, discount: Column): Column =
    dec2(price) * (one2 - dec2(discount))

  /** Table loader. events.ts is parquet TIMESTAMP(NANOS), which Spark 4
    * rejects outright ([PARQUET_TYPE_ILLEGAL]); read it as a nanos LONG
    * (legacy conf) and rebuild the micros timestamp with integer
    * division — exactly DuckDB's ns→us truncation, keeping the oracle
    * comparison bit-identical.
    */
  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    // harness-proof: vec_dot resolves even in sessions built without
    // spark.sql.extensions=graft.plans.GraftExtensions
    graft.plans.GraftExtensions.ensure(spark)
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/$name.parquet")
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    } else spark.read.parquet(s"$dir/$name.parquet")
  }
}
