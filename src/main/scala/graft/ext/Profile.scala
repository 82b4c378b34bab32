package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Single-pass column profiler — the reference's per-file "type
  * analyzer" (`etl.py` schema inference samples 5 rows) generalized to
  * whole-table statistics: per column null count, exact distinct count,
  * numeric/string min-max, mean string length.
  *
  * Scale design: ALL columns are profiled in ONE aggregate over ONE
  * scan — per-column jobs would re-read the table N times. The row
  * result is pivoted to one-row-per-column by exploding a built array
  * of structs (narrow, post-aggregate, N rows total). Exact
  * count-distinct over many columns makes Catalyst plan an Expand
  * (input ×(distinct-aggs+1)) — the honest cost of exactness, kept
  * here because the oracle adjudicates exact values; `exact = false`
  * switches to HLL `approx_count_distinct`, the 100 TB default, where
  * the whole profile is a single no-Expand pass.
  */
object Profile {

  /** Column kinds: numeric, string, timestamp. */
  sealed trait Kind
  case object Num extends Kind
  case object Str extends Kind
  case object Ts extends Kind

  /** Profile `cols` of `df` in one pass; one output row per column.
    * Output: column_name, n_rows, n_null, n_distinct, min_num, max_num
    * (DOUBLE; timestamps as epoch seconds; null for strings), min_str,
    * max_str (strings only), avg_len (strings only).
    */
  def profile(df: DataFrame, cols: Seq[(String, Kind)],
      exact: Boolean = true): DataFrame = {
    require(cols.nonEmpty, "need at least one column")

    def nd(c: Column): Column =
      if (exact) count_distinct(c) else approx_count_distinct(c)

    val aggs: Seq[Column] = count(lit(1)).as("__n") +: cols.flatMap {
      case (name, kind) =>
        val c = col(name)
        val numC = kind match {
          case Num => c.cast("double")
          // NTZ has no direct double cast; LTZ→double = epoch seconds
          // (sessions pin UTC, so NTZ→LTZ is value-preserving)
          case Ts  => c.cast("timestamp_ltz").cast("double")
          case Str => lit(null).cast("double")
        }
        val strC = kind match {
          case Str => c
          case _   => lit(null).cast("string")
        }
        Seq(
          count(c).as(s"__cnt_$name"),
          nd(c).as(s"__nd_$name"),
          min(numC).as(s"__minn_$name"),
          max(numC).as(s"__maxn_$name"),
          min(strC).as(s"__mins_$name"),
          max(strC).as(s"__maxs_$name"),
          avg(kind match {
            case Str => length(c)
            case _   => lit(null).cast("int")
          }).as(s"__len_$name"))
    }

    val one = df.agg(aggs.head, aggs.tail: _*)
    val perCol = cols.map { case (name, _) =>
      struct(
        lit(name).as("column_name"),
        col("__n").cast("bigint").as("n_rows"),
        (col("__n") - col(s"__cnt_$name")).cast("bigint").as("n_null"),
        col(s"__nd_$name").cast("bigint").as("n_distinct"),
        col(s"__minn_$name").as("min_num"),
        col(s"__maxn_$name").as("max_num"),
        col(s"__mins_$name").as("min_str"),
        col(s"__maxs_$name").as("max_str"),
        col(s"__len_$name").cast("double").as("avg_len"))
    }
    one.select(explode(array(perCol: _*)).as("p")).select(col("p.*"))
  }
}
