package graft.grid

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** The reference's IR-A: an untyped 2-D cell grid — every cell a string,
  * columns named 0..n-1 (etl.py:534, 258; SURVEY.md §1.1).
  *
  * Spark has no intrinsic row order, but grid semantics (header
  * promotion, block detection) need one (SURVEY.md §7.4 trap #1), so a
  * Grid is a DataFrame with an explicit `_row` column assigned at ingest
  * from the source's physical order (RDD zipWithIndex: per-partition
  * order is scan order and partitions are index-ordered — stable, unlike
  * monotonically_increasing_id after a shuffle).
  */
final case class Grid(df: DataFrame, nCols: Int) {
  def dataCols: Seq[String] = (0 until nCols).map(_.toString)

  /** Driver-side materialization, row-ordered. Only valid for
    * spreadsheet-scale grids — guarded to keep the O(rows) collect
    * explicit and bounded (north-star rule: no unbounded collects).
    */
  def collectCells(maxCells: Long = Grid.MaxDriverCells): Array[Array[String]] = {
    val total = df.count() * nCols
    require(total <= maxCells,
      s"Grid has $total cells > $maxCells driver bound; use TableDetect.findTablesDistributedCoords")
    df.orderBy("_row")
      .select(dataCols.map(col): _*)
      .collect()
      .map(r => Array.tabulate(nCols)(i => if (r.isNullAt(i)) null else r.getString(i)))
  }
}

object Grid {
  val MaxDriverCells: Long = 10L * 1000 * 1000

  /** Build a grid from in-memory rows (tests, inline fixtures). Ragged
    * rows are right-padded with nulls, like a spreadsheet read.
    */
  def fromRows(spark: SparkSession, rows: Seq[Seq[String]]): Grid = {
    val n = if (rows.isEmpty) 0 else rows.map(_.length).max
    val schema = StructType(
      StructField("_row", LongType, nullable = false) +:
        (0 until n).map(i => StructField(i.toString, StringType, nullable = true)))
    val data = rows.zipWithIndex.map { case (r, i) =>
      Row.fromSeq(i.toLong +: (0 until n).map(j => r.lift(j).orNull))
    }
    Grid(spark.createDataFrame(
      spark.sparkContext.parallelize(data.toSeq, 1), schema), n)
  }

  /** Headerless all-string CSV ingest with delimiter sniffing
    * (etl.py:534, 548–557). The sniffer reads a bounded sample through
    * Spark (no driver file IO), counts candidate delimiters per line,
    * and picks the one with the highest consistent per-line count —
    * falling back to ',' like the reference's ParserError fallback.
    */
  def readCsv(spark: SparkSession, path: String, sep: Option[String] = None): Grid = {
    val delim = sep.getOrElse(sniffDelimiter(spark, path))
    val raw = spark.read
      .option("header", "false")
      .option("inferSchema", "false")
      .option("sep", delim)
      .csv(path)
    val n = raw.columns.length
    withRowIds(raw.toDF((0 until n).map(_.toString): _*), n)
  }

  /** Attach stable `_row` ids from scan order via zipWithIndex. */
  def withRowIds(df: DataFrame, nCols: Int): Grid = {
    val spark = df.sparkSession
    val schema = StructType(
      StructField("_row", LongType, nullable = false) +: df.schema.fields)
    val rdd = df.rdd.zipWithIndex.map { case (r, i) => Row.fromSeq(i +: r.toSeq) }
    Grid(spark.createDataFrame(rdd, schema), nCols)
  }

  private val candidates = Seq(',', ';', '\t', '|')

  def sniffDelimiter(spark: SparkSession, path: String): String = {
    val sample = spark.read.text(path).limit(32).collect().map(_.getString(0))
    if (sample.isEmpty) return ","
    // Best = delimiter whose per-line count is positive and most uniform
    // (modal count agreement), ties broken by candidate order.
    val best = candidates.maxBy { d =>
      val counts = sample.map(_.count(_ == d))
      val modal = counts.groupBy(identity).maxByOption(_._2.length)
      modal match {
        case Some((cnt, lines)) if cnt > 0 => lines.length * 1000 + cnt
        case _ => 0
      }
    }
    val bestCounts = sample.map(_.count(_ == best))
    if (bestCounts.forall(_ == 0)) "," else best.toString
  }
}
