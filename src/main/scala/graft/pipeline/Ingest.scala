package graft.pipeline

import org.apache.spark.sql.SparkSession
import graft.clean.Cleaner
import graft.core.Names
import graft.grid.{Grid, TableDetect}
import graft.io.Sink
import graft.schema.{Align, Resolver}

/** process_object parity (etl.py:1238–1354): the reference's fixed
  * "query plan" — read → detect tables per sheet → clean → determine
  * schema → align → load — with per-table error isolation and the exact
  * table-naming rules of etl.py:1302–1313.
  */
object Ingest {

  final case class LoadedTable(name: String, rows: Long, cols: Int, warnings: Seq[String])
  final case class Report(loaded: Seq[LoadedTable], errors: Seq[String])

  private val datasetIdRe = "^[a-zA-Z0-9_]+$".r // etl.py:1242

  /** Sink table name = file[_sheet][_tableN], each part sanitized,
    * whole name truncated to 1024 (etl.py:1302–1313). The sheet part is
    * appended when the sheet is named, there are multiple sheets, or a
    * default sheet yielded multiple tables — condition kept verbatim.
    */
  def tableName(baseFile: String, sheet: String, nSheets: Int,
      tablesInSheet: Int, tableId: String): String = {
    val parts = scala.collection.mutable.ArrayBuffer(Names.sanitize(baseFile))
    if (sheet != "_default_" || nSheets > 1 || (tablesInSheet > 1 && sheet == "_default_"))
      parts += Names.sanitize(sheet)
    if (tablesInSheet > 1) parts += Names.sanitize(tableId)
    parts.filter(_.nonEmpty).mkString("_").take(Names.MaxTableNameLen)
  }

  /** Ingest one object (a CSV path or a pre-read sheet map) into
    * per-table parquet under `datasetDir`. Parquet objects are already
    * typed relations — they bypass grid detection (the reference runs
    * them through the same path because everything is a pandas frame to
    * it; for typed input the detector trivially accepts the whole sheet).
    */
  def processObject(
      spark: SparkSession,
      objectPath: String,
      datasetDir: String,
      datasetId: String,
      strategy: String = "existing_or_pandas",
      disposition: String = "WRITE_APPEND"): Report = {
    require(datasetIdRe.matches(datasetId), s"Invalid target dataset ID format: $datasetId") // etl.py:1242–1244

    // extension dispatch (etl.py:526–529); a trailing .gz is transparent
    // for the formats Spark decompresses natively (csv, json)
    val nameNoGz = {
      val low = objectPath.toLowerCase
      if (low.endsWith(".gz")) objectPath.dropRight(3) else objectPath
    }
    val baseName = {
      val f = new java.io.File(nameNoGz).getName
      f.lastIndexOf('.') match { case -1 => f; case i => f.substring(0, i) }
    }
    val ext = nameNoGz.toLowerCase.reverse.takeWhile(_ != '.').reverse

    val sheets: Map[String, Grid] = ext match {
      case "csv" => Map("_default_" -> Grid.readCsv(spark, objectPath))
      case "json" | "jsonl" =>
        // beyond the reference's formats: JSON-lines, typed by Spark's
        // reader, stringified into the grid IR like the parquet path
        val df = spark.read.json(objectPath)
        Map("_default_" -> typedToGrid(spark, df))
      case "parquet" =>
        // typed passthrough: stringify into grid IR for a uniform path
        Map("_default_" -> typedToGrid(spark, spark.read.parquet(objectPath)))
      case "orc" =>
        // beyond the reference's formats: ORC is Spark-native and flows
        // through the same typed passthrough as parquet
        Map("_default_" -> typedToGrid(spark, spark.read.orc(objectPath)))
      case "xlsx" =>
        // driver-side workbook read into the grid IR (etl.py:242–271)
        graft.io.XlsxReader.readWorkbook(spark, objectPath)
      case "xls" =>
        // binary BIFF8 workbook (the reference reads it via pandas+xlrd,
        // etl.py:527,544,564)
        graft.io.XlsReader.readWorkbook(spark, objectPath)
      case other =>
        throw new IllegalArgumentException(s"Unsupported extension: .$other") // etl.py:526–529
    }

    processSheets(spark, sheets, baseName, datasetDir, datasetId, strategy, disposition)
  }

  /** Typed DataFrame → grid IR: a synthetic header row of the column
    * names, then every value stringified — the uniform path that lets
    * typed sources flow through the same detect→clean→infer→align
    * pipeline as untyped grids.
    */
  private def typedToGrid(spark: SparkSession,
      df: org.apache.spark.sql.DataFrame): Grid = {
    val asStr = df.select(df.columns.map(c =>
      org.apache.spark.sql.functions.col(c).cast("string")): _*)
    val hdr = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(org.apache.spark.sql.Row.fromSeq(df.columns.toSeq)), 1),
      org.apache.spark.sql.types.StructType(df.columns.map(c =>
        org.apache.spark.sql.types.StructField(c, org.apache.spark.sql.types.StringType))))
    Grid.withRowIds(
      hdr.toDF(df.columns.indices.map(_.toString): _*)
        .unionByName(asStr.toDF(df.columns.indices.map(_.toString): _*)),
      df.columns.length)
  }

  /** Sheet-map entry point (the workbook path, etl.py:1272–1344). */
  def processSheets(
      spark: SparkSession,
      sheets: Map[String, Grid],
      baseName: String,
      datasetDir: String,
      datasetId: String,
      strategy: String = "existing_or_pandas",
      disposition: String = "WRITE_APPEND"): Report = {
    val loaded = scala.collection.mutable.ArrayBuffer.empty[LoadedTable]
    val errors = scala.collection.mutable.ArrayBuffer.empty[String]

    for ((sheetName, grid) <- sheets) {
      // detection failures (oversized grid, pathological input) are
      // per-SHEET errors — they must not abort sibling sheets
      // (etl.py:1329–1344 isolation applies to the whole table loop)
      val tables =
        try TableDetect.findTables(grid.collectCells())
        catch {
          case e: Exception =>
            errors += s"$baseName/$sheetName: detection failed: ${e.getMessage}"
            Seq.empty
        }
      for (table <- tables) {
        val name = tableName(baseName, sheetName, sheets.size, tables.size, table.id)
        try {
          val sub = Grid.fromRows(spark, table.cells.toIndexedSeq.map(_.toIndexedSeq))
          val cleaned = Cleaner.clean(sub)
          if (cleaned.names.nonEmpty) {
            val sinkPath = s"$datasetDir/$name"
            val dataDf = cleaned.df.drop("_row")
            val schema = Resolver.determine(dataDf, cleaned.names, sinkPath, strategy)
            val aligned = Align.align(dataDf, schema)
            val warns = Align.inflationWarnings(dataDf, schema)
              .map(w => s"${w.column}->${w.bqType}: ${w.newNulls} new NULLs")
            Sink.write(aligned, sinkPath, disposition)
            loaded += LoadedTable(name, aligned.count(), schema.size, warns)
          }
        } catch {
          case e: Exception => errors += s"$name: ${e.getMessage}" // etl.py:1329–1344 isolation
        }
      }
    }
    if (loaded.isEmpty && errors.nonEmpty)
      throw new IllegalStateException(s"Failed to process any table: ${errors.mkString("; ")}") // etl.py:1341–1344
    Report(loaded.toSeq, errors.toSeq)
  }
}
