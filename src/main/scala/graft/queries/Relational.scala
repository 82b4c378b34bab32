package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.queries.Tables.t

/** Relational query surface (SURVEY.md §2.7).
  *
  * The reference (etl.py) delegates all relational execution to BigQuery
  * after load (`load_to_bq`, etl.py:1156); our engine internalizes that
  * layer as Spark SQL / DataFrame plans. Each query here exercises one
  * operator category over the TESTDATA.md tables and carries a DuckDB
  * oracle.
  *
  * Determinism rule: every aggregation over a floating-point column is
  * computed over DECIMAL casts — decimal sums are exact and
  * order-independent, so Spark (partial aggregation, any partitioning)
  * and DuckDB produce bit-identical results. Per-row double arithmetic
  * (no reduction) is IEEE-deterministic and safe to keep as double.
  */
object Relational {

  /** Cast a clean double column to decimal(10,2) BEFORE any arithmetic.
    * Spark's double→decimal cast rounds the double's shortest string form
    * (java BigDecimal.valueOf) while DuckDB rounds the exact binary value;
    * on source columns (2-decimal generated data) both agree, and all
    * subsequent decimal arithmetic is exact and order-independent.
    */
  private def dec2(c: Column): Column = c.cast("decimal(10,2)")
  private val one2 = lit(1).cast("decimal(10,2)")

  /** The driver's hash is TYPE-sensitive (ADVICE.md r01): Spark's
    * SUM(DECIMAL(p,s)) widens precision to p+10 while DuckDB widens to 38,
    * so every final aggregate must be cast to the exact type DuckDB
    * produces — SUM(DECIMAL(_,s)) → DECIMAL(38,s), COUNT → BIGINT.
    */
  private def sum38(c: Column, scale: Int, name: String): Column =
    sum(c).cast(s"decimal(38,$scale)").as(name)

  /** TPC-H Q1 shape: scan → filter → hash agg (partial+final) → sort. */
  val q1PricingSummary = Q(
    "q1_pricing_summary",
    (s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum38(dec2(col("l_quantity")), 2, "sum_qty"),
          sum38(dec2(col("l_extendedprice")), 2, "sum_base_price"),
          sum38(dec2(col("l_extendedprice")) * (one2 - dec2(col("l_discount"))),
            4, "sum_disc_price"),
          sum38(dec2(col("l_extendedprice")) * (one2 - dec2(col("l_discount")))
            * (one2 + dec2(col("l_tax"))), 6, "sum_charge"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },
    Some("""SELECT l_returnflag, l_linestatus,
      SUM(CAST(l_quantity AS DECIMAL(10,2))) AS sum_qty,
      SUM(CAST(l_extendedprice AS DECIMAL(10,2))) AS sum_base_price,
      SUM(CAST(l_extendedprice AS DECIMAL(10,2)) * (CAST(1 AS DECIMAL(10,2)) - CAST(l_discount AS DECIMAL(10,2)))) AS sum_disc_price,
      SUM(CAST(l_extendedprice AS DECIMAL(10,2)) * (CAST(1 AS DECIMAL(10,2)) - CAST(l_discount AS DECIMAL(10,2))) * (CAST(1 AS DECIMAL(10,2)) + CAST(l_tax AS DECIMAL(10,2)))) AS sum_charge,
      COUNT(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus"""),
    bench = true)

  val queries: Seq[Q] = Seq(q1PricingSummary)
}
