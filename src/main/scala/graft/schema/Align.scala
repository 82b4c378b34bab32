package graft.schema

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.core.Nulls
import graft.schema.Infer.Field

/** Schema application (align_dataframe_to_schema, etl.py:1012–1152):
  * drop frame-only columns → add schema-only columns as NULL → reorder
  * to schema order → per-type coercing casts (failure → NULL) — all one
  * narrow `select`, no shuffle.
  *
  * Deviation from reference, documented: pandas applies conversions
  * column-at-a-time and abandons the WHOLE column on a single bad value
  * (the astype raises and the except leaves it object, etl.py:1138);
  * we coerce element-wise (bad value → NULL, rest converted) — strictly
  * more useful and the semantics BigQuery itself would apply.
  */
object Align {

  /** Conversion table of SURVEY.md §1.2 / etl.py:1057–1147. */
  def castTo(c: Column, bqType: String): Column = bqType.toUpperCase match {
    case "INTEGER" | "INT64" =>
      // pandas to_numeric+Int64: numeric and integral ⇒ value, else NULL.
      // Integer-SHAPED strings parse exactly (a double round-trip would
      // corrupt 19-digit ids above 2^53); everything else goes through
      // the double-integral test (so "10.5" ⇒ NULL, never truncated 10).
      val exact = when(trim(c).rlike("^[+-]?\\d+$"), trim(c).cast("long"))
      val d = c.cast("double")
      coalesce(exact,
        when(d === floor(d) && d.between(-9.2e18, 9.2e18), d.cast("long"))
          .otherwise(lit(null).cast("long")))
    case "FLOAT" | "FLOAT64" => c.cast("double")
    case "NUMERIC" | "BIGNUMERIC" =>
      // reference degrades NUMERIC to float (etl.py:1076–1078, lossy);
      // we keep exact decimals — documented improvement
      c.cast("decimal(38,9)")
    case "BOOLEAN" | "BOOL" => Nulls.boolCast(c)
    case "TIMESTAMP" | "DATETIME" => Infer.tryTimestamp(c)
    case "DATE" => to_date(Infer.tryTimestamp(c))
    case "TIME" =>
      // Spark has no TIME type: normalized HH:mm:ss string (SURVEY §1.2)
      date_format(Infer.tryTimestamp(concat(lit("1970-01-01 "), c)), "HH:mm:ss")
    case "BYTES" =>
      // reference degrades BYTES to STRING with a warning (etl.py:1115)
      c.cast("string")
    case _ => c.cast("string") // STRING, JSON, GEOGRAPHY(WKT)
  }

  /** Column alignment + typed coercion (etl.py:1034–1049 + 1057–1147). */
  def align(df: DataFrame, schema: Seq[Field]): DataFrame = {
    require(schema.nonEmpty, "Schema list cannot be empty for alignment") // etl.py:1021
    val present = df.columns.toSet
    df.select(schema.map { f =>
      val in = if (present.contains(f.name)) col(f.name) else lit(null).cast("string")
      castTo(in, f.bqType).as(f.name)
    }: _*)
  }

  final case class InflationWarning(column: String, bqType: String, newNulls: Long)

  /** Null-inflation observer (etl.py:1121–1126): warn when a cast nulls
    * out >10% of previously-non-null values and >5 total. One extra
    * aggregation job over before/after counts; purely an observer.
    */
  def inflationWarnings(df: DataFrame, schema: Seq[Field]): Seq[InflationWarning] = {
    val present = df.columns.toSet
    val checked = schema.filter(f => present.contains(f.name))
    if (checked.isEmpty) return Seq.empty
    val aggs = checked.flatMap { f =>
      Seq(count(col(f.name)).as(s"${f.name}__before"),
        count(castTo(col(f.name), f.bqType)).as(s"${f.name}__after"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    checked.flatMap { f =>
      val before = row.getLong(row.fieldIndex(s"${f.name}__before"))
      val after = row.getLong(row.fieldIndex(s"${f.name}__after"))
      val newNulls = before - after
      if (newNulls > 0.1 * before && newNulls > 5)
        Some(InflationWarning(f.name, f.bqType, newNulls))
      else None
    }
  }
}
