package graft.io

import graft.SparkSuite
import graft.pipeline.Ingest
import java.nio.file.Files
import java.util.zip.{ZipEntry, ZipOutputStream}

/** XLSX adapter: hand-built workbook zip → grids → full ingest. */
class XlsxReaderSpec extends SparkSuite {

  private def buildXlsx(path: java.nio.file.Path): Unit = {
    val z = new ZipOutputStream(Files.newOutputStream(path))
    def put(name: String, content: String): Unit = {
      z.putNextEntry(new ZipEntry(name))
      z.write(content.getBytes("UTF-8")); z.closeEntry()
    }
    put("xl/workbook.xml",
      """<?xml version="1.0"?>
        |<workbook xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
        |<sheets>
        |<sheet name="Invoices" sheetId="1" r:id="rId1"/>
        |<sheet name="Empty" sheetId="2" r:id="rId2"/>
        |</sheets></workbook>""".stripMargin)
    put("xl/_rels/workbook.xml.rels",
      """<?xml version="1.0"?>
        |<Relationships>
        |<Relationship Id="rId1" Target="worksheets/sheet1.xml"/>
        |<Relationship Id="rId2" Target="worksheets/sheet2.xml"/>
        |</Relationships>""".stripMargin)
    put("xl/sharedStrings.xml",
      """<?xml version="1.0"?>
        |<sst><si><t>id</t></si><si><t>name</t></si><si><t>amount</t></si>
        |<si><t>alpha</t></si><si><r><t>be</t></r><r><t>ta</t></r></si></sst>""".stripMargin)
    // beta is a rich-text shared string; B3 missing (gap preserved)
    put("xl/worksheets/sheet1.xml",
      """<?xml version="1.0"?>
        |<worksheet><sheetData>
        |<row r="1">
        |  <c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c><c r="C1" t="s"><v>2</v></c>
        |</row>
        |<row r="2">
        |  <c r="A2"><v>1</v></c><c r="B2" t="s"><v>4</v></c><c r="C2"><v>10.5</v></c>
        |</row>
        |<row r="3">
        |  <c r="A3"><v>2</v></c><c r="C3"><v>20</v></c>
        |</row>
        |<row r="4">
        |  <c r="A4"><v>3</v></c><c r="B4" t="s"><v>3</v></c><c r="C4"><v>30</v></c>
        |</row>
        |</sheetData></worksheet>""".stripMargin)
    put("xl/worksheets/sheet2.xml",
      """<?xml version="1.0"?><worksheet><sheetData/></worksheet>""")
    z.close()
  }

  test("A1 reference to column index") {
    assert(XlsxReader.colIndex("A1") == 0)
    assert(XlsxReader.colIndex("Z9") == 25)
    assert(XlsxReader.colIndex("AA12") == 26)
    assert(XlsxReader.colIndex("BC23") == 54)
  }

  test("reads sheets, shared strings, gaps, and empty sheets") {
    val dir = Files.createTempDirectory("xlsx")
    val f = dir.resolve("book.xlsx"); buildXlsx(f)
    val wb = XlsxReader.readWorkbook(spark, f.toString)
    assert(wb.keySet == Set("Invoices", "Empty"))
    val cells = wb("Invoices").collectCells()
    assert(cells.length == 4)
    assert(cells(0).toSeq == Seq("id", "name", "amount"))
    assert(cells(1).toSeq == Seq("1", "beta", "10.5")) // rich-text join
    assert(cells(2).toSeq == Seq("2", null, "20")) // gap preserved
    assert(cells(3).toSeq == Seq("3", "alpha", "30"))
    assert(wb("Empty").collectCells().isEmpty)
  }

  test("ref-less cells restart at column 0 per row; inline rich text concatenates") {
    val dir = Files.createTempDirectory("xlsx3")
    val f = dir.resolve("book.xlsx")
    val z = new ZipOutputStream(Files.newOutputStream(f))
    def put(name: String, content: String): Unit = {
      z.putNextEntry(new ZipEntry(name)); z.write(content.getBytes("UTF-8")); z.closeEntry()
    }
    put("xl/workbook.xml",
      """<?xml version="1.0"?><workbook xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
        |<sheets><sheet name="S" sheetId="1" r:id="rId1"/></sheets></workbook>""".stripMargin)
    put("xl/_rels/workbook.xml.rels",
      """<?xml version="1.0"?><Relationships>
        |<Relationship Id="rId1" Target="worksheets/sheet1.xml"/></Relationships>""".stripMargin)
    // no cell refs at all (streaming-writer style) + an inline rich-text
    // cell split into two runs
    put("xl/worksheets/sheet1.xml",
      """<?xml version="1.0"?><worksheet><sheetData>
        |<row><c><v>1</v></c><c t="inlineStr"><is><r><t>be</t></r><r><t>ta</t></r></is></c><c><v>3</v></c></row>
        |<row><c><v>4</v></c><c><v>5</v></c><c><v>6</v></c></row>
        |</sheetData></worksheet>""".stripMargin)
    z.close()

    val wb = XlsxReader.readWorkbook(spark, f.toString)
    val cells = wb("S").collectCells()
    assert(cells.length == 2)
    assert(cells(0).toSeq == Seq("1", "beta", "3"), "row 1 misparsed")
    assert(cells(1).toSeq == Seq("4", "5", "6"), "ref-less row 2 must restart at column 0")
  }

  test("xlsx flows through the full ingest pipeline") {
    val dir = Files.createTempDirectory("xlsx2")
    val f = dir.resolve("book.xlsx"); buildXlsx(f)
    val out = dir.resolve("ds").toString
    val report = Ingest.processObject(spark, f.toString, out, "ds1")
    assert(report.errors.isEmpty)
    // 2 sheets + named sheets ⇒ sheet suffix in the table name
    assert(report.loaded.map(_.name) == Seq("book_Invoices"))
    val t = spark.read.parquet(s"$out/book_Invoices")
    assert(t.columns.toSeq == Seq("id", "name", "amount"))
    import org.apache.spark.sql.types._
    assert(t.schema("id").dataType == LongType)
    assert(t.schema("amount").dataType == DoubleType)
    assert(t.count() == 3)
  }
}
