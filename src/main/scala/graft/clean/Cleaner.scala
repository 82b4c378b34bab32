package graft.clean

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.{Names, Nulls}
import graft.grid.Grid

/** clean_dataframe parity (etl.py:623–709): header promotion → name
  * sanitization/dedup → drop all-null cols/rows → trim → null tokens.
  *
  * Decisions that need the first row (promotion heuristics) are O(1)
  * driver work; every data transformation is a narrow Spark projection.
  */
object Cleaner {

  final case class Cleaned(df: DataFrame, promotedHeader: Boolean, names: Seq[String])

  /** Header promotion heuristic (etl.py:634–642), threshold-exact:
    * distinct/nonNull > 0.8 AND nonNull/nCols > 0.6 AND distinct > 1 AND
    * (current names generic ^(Unnamed: \d+|\d+)$ OR first row more
    * distinct than current names).
    *
    * nonNull excludes {None,nan,NaN,NA,<NA>} (etl.py:630–631 — note this
    * is a THIRD token set, narrower than detection; kept verbatim).
    * distinct counts raw strings (pandas astype(str).nunique()).
    */
  private val headerNullTokens = Set("None", "nan", "NaN", "NA", "<NA>")

  def isLikelyHeader(firstRow: Seq[String], currentNames: Seq[String]): Boolean = {
    val asStr = firstRow.map(v => if (v == null) "nan" else v) // pandas str(NaN)
    val nonNull = asStr.count(v => !headerNullTokens.contains(v))
    val distinct = asStr.distinct.length
    val nCols = currentNames.length
    val generic = currentNames.forall(_.matches("^(Unnamed: \\d+|\\d+)$"))
    distinct.toDouble / math.max(1, nonNull) > 0.8 &&
      nonNull.toDouble / math.max(1, nCols) > 0.6 &&
      distinct > 1 &&
      (generic || distinct > currentNames.distinct.length)
  }

  /** Full cleaning pass over a grid (columns "0".."n-1", `_row` order). */
  def clean(grid: Grid): Cleaned = {
    val dataCols = grid.dataCols
    if (dataCols.isEmpty) return Cleaned(grid.df, promotedHeader = false, Seq.empty)

    // one job fetches the first row AND its _row id (= min(_row), since
    // the limit-1 is ordered by it)
    val firstRowOpt = grid.df.orderBy("_row").limit(1)
      .select(col("_row") +: dataCols.map(col): _*).collect().headOption
    if (firstRowOpt.isEmpty) return Cleaned(grid.df, promotedHeader = false, dataCols)
    val firstRow = dataCols.indices.map(i =>
      if (firstRowOpt.get.isNullAt(i + 1)) null else firstRowOpt.get.getString(i + 1))
    val minRow = firstRowOpt.get.getLong(0)

    val promote = isLikelyHeader(firstRow, dataCols)
    val rawNames =
      if (promote) firstRow.map(v => if (v == null) "nan" else v) // pandas str(NaN) → 'nan'
      else dataCols
    val names = Names.sanitizeAll(rawNames)

    var df = grid.df
    if (promote) df = df.filter(col("_row") > minRow) // drop promoted row (etl.py:648)

    // rename to final names (etl.py:673)
    df = df.select(col("_row") +: dataCols.zip(names).map { case (c, n) => col(c).as(n) }: _*)

    // drop fully-null COLUMNS then ROWS on RAW nulls (etl.py:680–681 —
    // this happens BEFORE token normalization, so cells holding the
    // string "null" do not trigger drops): one aggregation pass.
    val countCols = count(lit(1)).as("_n") +: names.map(n => count(col(n)).as(n))
    val counts = df.agg(countCols.head, countCols.tail: _*).head()
    val keep = names.zipWithIndex.collect { case (n, i) if counts.getLong(i + 1) > 0 => n }
    df = df.select(col("_row") +: keep.map(col): _*)
    if (keep.nonEmpty)
      df = df.filter(keep.map(n => col(n).isNotNull).reduce(_ || _))

    // trim, then case-insensitive whole-cell null token → NULL
    // (etl.py:689–705; '' included via the cleaning token set).
    df = df.select(col("_row") +: keep.map(n => Nulls.cleanNulls(trim(col(n))).as(n)): _*)

    Cleaned(df, promote, keep)
  }
}
