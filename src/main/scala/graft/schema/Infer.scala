package graft.schema

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.core.Nulls

/** Heuristic schema inference (infer_schema_pandas, etl.py:851–924).
  *
  * The reference tries, per column over the FULL column: strict integer →
  * float → datetime (guarded: never on all-digit strings like zip codes,
  * etl.py:884) → boolean token set → STRING fallback.
  *
  * The pandas version runs try/except conversions column-by-column (up
  * to 4 full passes per column); ours computes every candidate's success
  * count for ALL columns in ONE aggregation pass and picks the narrowest
  * type whose success count equals the non-null count — same result,
  * strictly fewer scans (SURVEY.md §2.4).
  *
  * Types use the reference's BigQuery vocabulary (SURVEY.md §1.2).
  */
object Infer {

  final case class Field(name: String, bqType: String, mode: String = "NULLABLE")

  /** Accepted timestamp shapes: ISO date/datetime plus the common slash
    * forms pd.to_datetime handles. Kept as an explicit list because
    * Spark's to_timestamp only parses ISO by default (SURVEY.md §7.4).
    */
  def tryTimestamp(c: Column): Column = coalesce(
    try_to_timestamp(c),
    try_to_timestamp(c, lit("yyyy-MM-dd'T'HH:mm:ss")),
    try_to_timestamp(c, lit("M/d/yyyy H:mm:ss")),
    try_to_timestamp(c, lit("M/d/yyyy")),
    try_to_timestamp(c, lit("yyyy/M/d")),
    try_to_timestamp(c, lit("dd-MMM-yyyy")))

  def inferSchema(df: DataFrame, cols: Seq[String]): Seq[Field] = {
    if (cols.isEmpty) return Seq.empty
    val aggs = cols.flatMap { name =>
      val c = col(name)
      val d = c.cast("double")
      Seq(
        count(c).as(s"${name}__nn"),
        count(when(d.isNotNull && d === floor(d) && d.between(-9.2e18, 9.2e18), 1)).as(s"${name}__int"),
        count(when(d.isNotNull, 1)).as(s"${name}__flt"),
        count(when(tryTimestamp(c).isNotNull, 1)).as(s"${name}__ts"),
        count(when(c.rlike("^\\d+$"), 1)).as(s"${name}__dig"),
        count(when(lower(c).isin(Nulls.trueTokens ++ Nulls.falseTokens: _*), 1)).as(s"${name}__bool"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    def g(n: String): Long = row.getLong(row.fieldIndex(n))

    cols.map { name =>
      val nn = g(s"${name}__nn")
      val bq =
        if (nn == 0) "STRING" // fully-null column stays object (etl.py:863)
        else if (g(s"${name}__int") == nn) "INTEGER"
        else if (g(s"${name}__flt") == nn) "FLOAT"
        // all-digits guard (etl.py:884): digit-only columns are IDs, not dates
        else if (g(s"${name}__dig") != nn && g(s"${name}__ts") == nn) "TIMESTAMP"
        else if (g(s"${name}__bool") == nn) "BOOLEAN"
        else "STRING"
      Field(name, bq)
    }
  }

  /** Spark-dtype → BQ mapping for already-typed frames
    * (map_pandas_dtype_to_bq, etl.py:226–233).
    */
  def fromSparkType(dt: org.apache.spark.sql.types.DataType): String = {
    import org.apache.spark.sql.types._
    dt match {
      case ByteType | ShortType | IntegerType | LongType => "INTEGER"
      case FloatType | DoubleType => "FLOAT"
      case _: DecimalType => "NUMERIC"
      case BooleanType => "BOOLEAN"
      case TimestampType | TimestampNTZType => "TIMESTAMP"
      case DateType => "DATE"
      case _: DayTimeIntervalType => "INTERVAL"
      case _ => "STRING"
    }
  }
}
