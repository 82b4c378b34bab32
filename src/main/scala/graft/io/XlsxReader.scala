package graft.io

import java.io.InputStream
import java.util.zip.ZipFile
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants, XMLStreamReader}
import org.apache.spark.sql.SparkSession
import graft.grid.Grid

/** Minimal XLSX workbook reader (reference: _read_excel_sheets,
  * etl.py:242–271) built on plain JDK (java.util.zip + StAX) — no POI
  * dependency, which this offline environment can't resolve.
  *
  * XLSX is a zip of XML parts: workbook.xml lists sheets (name +
  * relationship id), xl/_rels maps relationship ids to sheet parts,
  * sharedStrings.xml holds the string table, each sheet part holds rows
  * of cells with an A1-style reference and either an inline value or a
  * shared-string index. Like the reference, every cell is read as a
  * STRING (the grid IR), header suppressed, columns renumbered 0..n-1.
  *
  * Scope: cell types s (shared string), inlineStr, n/b/str (raw value
  * text) — formulas yield their cached value; legacy binary .xls is
  * handled by the sibling [[XlsReader]] (BIFF8).
  *
  * Driver-side by design: workbooks are spreadsheet-scale artifacts
  * (the reference loads them whole into pandas); the output is a Grid
  * whose downstream processing is distributed.
  */
object XlsxReader {

  def readWorkbook(spark: SparkSession, path: String): Map[String, Grid] = {
    val zip = new ZipFile(path)
    try {
      val shared = Option(zip.getEntry("xl/sharedStrings.xml"))
        .map(e => parseSharedStrings(zip.getInputStream(e)))
        .getOrElse(IndexedSeq.empty)
      val rels = Option(zip.getEntry("xl/_rels/workbook.xml.rels"))
        .map(e => parseRels(zip.getInputStream(e)))
        .getOrElse(Map.empty)
      val sheets = parseWorkbook(zip.getInputStream(zip.getEntry("xl/workbook.xml")))
      sheets.map { case (name, rid) =>
        val target = rels.getOrElse(rid, s"worksheets/sheet1.xml")
        val entryName = if (target.startsWith("/")) target.drop(1) else s"xl/$target"
        val rows = Option(zip.getEntry(entryName))
          .map(e => parseSheet(zip.getInputStream(e), shared))
          .getOrElse(Seq.empty)
        name -> Grid.fromRows(spark, rows)
      }.toMap
    } finally zip.close()
  }

  private def reader(in: InputStream): XMLStreamReader = {
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f.createXMLStreamReader(in)
  }

  /** sharedStrings.xml: <si> items; rich-text runs concatenate <t>s. */
  private def parseSharedStrings(in: InputStream): IndexedSeq[String] = {
    val r = reader(in)
    val out = IndexedSeq.newBuilder[String]
    val cur = new StringBuilder
    var inT = false
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          if (r.getLocalName == "si") cur.clear()
          else if (r.getLocalName == "t") inT = true
        case XMLStreamConstants.CHARACTERS if inT => cur.append(r.getText)
        case XMLStreamConstants.END_ELEMENT =>
          if (r.getLocalName == "t") inT = false
          else if (r.getLocalName == "si") out += cur.toString
        case _ =>
      }
    }
    r.close(); out.result()
  }

  /** workbook.xml: ordered (sheet name, relationship id). */
  private def parseWorkbook(in: InputStream): Seq[(String, String)] = {
    val r = reader(in)
    val out = Seq.newBuilder[(String, String)]
    while (r.hasNext) {
      if (r.next() == XMLStreamConstants.START_ELEMENT && r.getLocalName == "sheet") {
        val name = Option(r.getAttributeValue(null, "name")).getOrElse("sheet")
        val rid = (0 until r.getAttributeCount)
          .find(i => r.getAttributeLocalName(i) == "id")
          .map(r.getAttributeValue).getOrElse("")
        out += name -> rid
      }
    }
    r.close(); out.result()
  }

  /** workbook.xml.rels: relationship id → target part path. */
  private def parseRels(in: InputStream): Map[String, String] = {
    val r = reader(in)
    val out = Map.newBuilder[String, String]
    while (r.hasNext) {
      if (r.next() == XMLStreamConstants.START_ELEMENT && r.getLocalName == "Relationship")
        out += Option(r.getAttributeValue(null, "Id")).getOrElse("") ->
          Option(r.getAttributeValue(null, "Target")).getOrElse("")
    }
    r.close(); out.result()
  }

  /** Column index from an A1-style cell reference ("BC23" → 54). */
  private[io] def colIndex(ref: String): Int = {
    var i = 0; var c = 0
    while (i < ref.length && ref.charAt(i).isLetter) {
      c = c * 26 + (ref.charAt(i).toUpper - 'A' + 1); i += 1
    }
    c - 1
  }

  /** One worksheet part → dense row-major grid of strings (empty cells
    * null), row/col positions honored from cell references so gaps are
    * preserved for table detection.
    */
  private def parseSheet(in: InputStream, shared: IndexedSeq[String]): Seq[Seq[String]] = {
    val r = reader(in)
    val rows = scala.collection.mutable.ArrayBuffer.empty[(Int, Map[Int, String])]
    var curRow = -1
    var cells = Map.empty[Int, String]
    var cellCol = -1
    var cellType = ""
    var inV = false
    val v = new StringBuilder
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
          case "row" =>
            curRow = Option(r.getAttributeValue(null, "r")).map(_.toInt - 1).getOrElse(curRow + 1)
            cells = Map.empty
            cellCol = -1 // ref-less cells restart at column 0 each row
          case "c" =>
            cellCol = Option(r.getAttributeValue(null, "r")).map(colIndex).getOrElse(cellCol + 1)
            cellType = Option(r.getAttributeValue(null, "t")).getOrElse("n")
            v.clear() // value accumulates across inline rich-text runs
          case "v" | "t" => inV = true
          case _ =>
        }
        case XMLStreamConstants.CHARACTERS if inV => v.append(r.getText)
        case XMLStreamConstants.END_ELEMENT => r.getLocalName match {
          case "v" | "t" => inV = false
          case "c" =>
            // write at cell end so multi-run inline strings concatenate
            val text = if (cellType == "s")
              v.toString.trim.toIntOption.flatMap(shared.lift).getOrElse(v.toString)
            else v.toString
            if (text.nonEmpty) cells += cellCol -> text
          case "row" => if (cells.nonEmpty) rows += curRow -> cells
          case _ =>
        }
        case _ =>
      }
    }
    r.close()
    if (rows.isEmpty) return Seq.empty
    val maxRow = rows.map(_._1).max
    val maxCol = rows.flatMap(_._2.keys).max
    val byRow = rows.toMap
    (0 to maxRow).map { ri =>
      val m = byRow.getOrElse(ri, Map.empty)
      (0 to maxCol).map(ci => m.get(ci).orNull)
    }
  }
}
