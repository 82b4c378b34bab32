package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Null-token normalization (reference: etl.py:365–366, 287, 702–705).
  *
  * The reference uses two slightly different token sets:
  *   - the DETECTION set, case-sensitive, used when masking cells for
  *     table detection / density (etl.py:365): blank/whitespace cells
  *     plus {None, none, null, NULL, NaN, NAN, <NA>, na, N/A, n/a};
  *   - the CLEANING set, case-insensitive whole-cell match, applied after
  *     trimming in clean_dataframe (etl.py:702–705):
  *     {'', none, null, nan, <na>, nat}.
  * Both are kept verbatim; the discrepancy is the reference's, noted in
  * SURVEY.md §2.3.
  */
object Nulls {
  /** etl.py:365 token list (case-sensitive, exact match). */
  val detectionTokens: Seq[String] =
    Seq("None", "none", "null", "NULL", "NaN", "NAN", "<NA>", "na", "N/A", "n/a")

  /** etl.py:702 token list (case-insensitive after trim). */
  val cleaningTokens: Seq[String] = Seq("", "none", "null", "nan", "<na>", "nat")

  /** True when a raw grid cell counts as CONTENT for table detection
    * (etl.py:365–366): non-null, not whitespace-only, not a detection
    * token.
    */
  def isContent(c: Column): Column =
    c.isNotNull && !c.rlike("^\\s*$") && !c.isin(detectionTokens: _*)

  /** Cleaning-pass normalization (etl.py:702–705): case-insensitive
    * whole-cell token match → NULL. Caller trims first (etl.py:694).
    */
  def cleanNulls(c: Column): Column =
    when(lower(c).isin(cleaningTokens: _*), lit(null)).otherwise(c)

  /** Boolean token cast (etl.py:1081–1087): the reference's token map —
    * a plain `cast("boolean")` would reject yes/y/t/1.0. Unknown tokens
    * coerce to NULL, matching pandas map() semantics.
    */
  val trueTokens: Seq[String] = Seq("true", "t", "yes", "y", "1", "1.0")
  val falseTokens: Seq[String] = Seq("false", "f", "no", "n", "0", "0.0")

  def boolCast(c: Column): Column = {
    val v = lower(trim(c))
    when(v.isin(trueTokens: _*), lit(true))
      .when(v.isin(falseTokens: _*), lit(false))
      .otherwise(lit(null).cast("boolean"))
  }
}
