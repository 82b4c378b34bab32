package graft.io

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.Files
import graft.SparkSuite

/** BIFF8 (.xls) reader against fixtures built from the public MS-CFB /
  * MS-XLS layouts by an independent writer below — both CFB placements
  * (mini-stream under the 4096-byte cutoff, regular FAT chain above it),
  * every cell record type, and SST CONTINUE splits with re-stated
  * option-flag bytes.
  */
class XlsReaderSpec extends SparkSuite {

  import XlsFixture._

  test("small workbook (mini-stream path): every cell record type lands") {
    val sst = Seq("hello", "world")
    val sheet1 = Seq(
      labelSst(0, 0, 0), labelSst(0, 1, 1),             // hello | world
      number(1, 0, 1234.5), rkInt(1, 1, 42),            // 1234.5 | 42
      rkInt100(1, 2, 123), rkDouble(1, 3, 2.5),         // 1.23 | 2.5
      mulRk(2, 0, Seq(7, 8, 9)),                        // 7 | 8 | 9
      label(3, 0, "inline"), boolErr(3, 1, true),       // inline | TRUE
      formulaNum(4, 0, 99.0),                           // 99
      formulaStr(4, 1), stringRec("cached"))            // cached
    val sheet2 = Seq(number(0, 0, 7.25))
    val bytes = cfb(workbook(sst, Seq("Alpha" -> sheet1, "Beta" -> sheet2)))
    assert(bytes.length < 8192, "fixture should exercise the mini-stream path")

    val sheets = XlsReader.parseBytes(bytes)
    assert(sheets.map(_._1) == Seq("Alpha", "Beta"))
    val g = sheets.head._2
    assert(g(0) == Seq("hello", "world", null, null))
    assert(g(1) == Seq("1234.5", "42", "1.23", "2.5"))
    assert(g(2) == Seq("7", "8", "9", null))
    assert(g(3) == Seq("inline", "TRUE", null, null))
    assert(g(4) == Seq("99", "cached", null, null))
    assert(sheets(1)._2 == Seq(Seq("7.25")))
  }

  test("SST split across CONTINUE re-reads the option-flags byte") {
    // string 1 complete in the SST record; string 2's characters split:
    // 3 compressed chars in SST, CONTINUE restarts with flags=1 (wide)
    // and carries the remaining 3 chars as UTF-16LE
    val sstRec = {
      val b = new ByteArrayOutputStream()
      b.writeBytes(u32(2)); b.writeBytes(u32(2))
      b.writeBytes(u16(5)); b.write(0); b.writeBytes("alpha".getBytes("ISO-8859-1"))
      b.writeBytes(u16(6)); b.write(0) // cch=6, compressed…
      b.writeBytes("spl".getBytes("ISO-8859-1")) // …but only 3 chars here
      rec(0x00FC, b.toByteArray)
    }
    val contRec = {
      val b = new ByteArrayOutputStream()
      b.write(1) // fresh flags: wide
      "über".take(3).foreach(c => b.writeBytes(u16(c.toInt)))
      rec(0x003C, b.toByteArray)
    }
    val sheet = Seq(labelSst(0, 0, 0), labelSst(0, 1, 1))
    val wb = workbookRaw(sstRec ++ contRec, Seq("S" -> sheet))
    val sheets = XlsReader.parseBytes(cfb(wb))
    assert(sheets.head._2.head == Seq("alpha", "spl" + "über".take(3)))
  }

  test("large workbook (regular FAT chain): 1500 numeric rows survive") {
    val cells = (0 until 1500).flatMap(r => Seq(number(r, 0, r), number(r, 1, r * 0.5)))
    val wb = workbook(Seq.empty, Seq("Big" -> cells))
    assert(wb.length >= 4096, "fixture must exceed the mini-stream cutoff")
    val sheets = XlsReader.parseBytes(cfb(wb))
    val g = sheets.head._2
    assert(g.length == 1500)
    assert(g(0) == Seq("0", "0"))
    assert(g(1499) == Seq("1499", "749.5"))
  }

  test("randomized round-trip: arbitrary grids survive writer -> reader") {
    val rnd = new scala.util.Random(12345L)
    val alphabets = Seq(
      "abcdefgh",            // compressed
      "äöüßéñ",              // still single-byte range
      "日本語中文한국",        // wide BMP
      "a𝓫c😀d")              // supplementary (surrogate pairs)
    def randomString(): String = {
      val alpha = alphabets(rnd.nextInt(alphabets.length))
      val cps = alpha.codePoints().toArray
      val n = 1 + rnd.nextInt(8)
      val sb = new java.lang.StringBuilder
      (0 until n).foreach(_ => sb.appendCodePoint(cps(rnd.nextInt(cps.length))))
      sb.toString
    }
    for (trial <- 0 until 10) {
      val nRows = 1 + rnd.nextInt(12)
      val nCols = 1 + rnd.nextInt(6)
      val expected = Array.fill[String](nRows, nCols)(null)
      val sstStrings = scala.collection.mutable.ArrayBuffer.empty[String]
      val cells = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
      for (r <- 0 until nRows; c <- 0 until nCols) rnd.nextInt(4) match {
        case 0 => // blank
        case 1 =>
          val s = randomString()
          expected(r)(c) = s
          sstStrings += s
          cells += labelSst(r, c, sstStrings.length - 1)
        case 2 =>
          val s = randomString()
          expected(r)(c) = s
          cells += label(r, c, s)
        case 3 =>
          val d = if (rnd.nextBoolean()) rnd.nextInt(100000).toDouble
                  else rnd.nextDouble() * 1000
          expected(r)(c) = if (d == math.rint(d)) d.toLong.toString else d.toString
          cells += number(r, c, d)
      }
      val parsed = XlsReader.parseBytes(
        cfb(workbook(sstStrings.toSeq, Seq("S" -> cells.toSeq)))).head._2
      // reader clips to the bounding box of non-empty cells
      val liveRows = (0 until nRows).filter(r => expected(r).exists(_ != null))
      if (liveRows.isEmpty) assert(parsed.isEmpty, s"trial $trial")
      else {
        val maxR = liveRows.max
        val maxC = (0 to maxR).flatMap(r =>
          (0 until nCols).filter(c => expected(r)(c) != null)).max
        val exp = (0 to maxR).map(r => (0 to maxC).map(c => expected(r)(c)))
        assert(parsed == exp, s"trial $trial: $parsed vs $exp")
      }
    }
  }

  test("pre-BIFF8 workbooks fail loudly instead of parsing garbage") {
    // same layout but the BOF declares BIFF5 (vers 0x0500)
    val wb = workbook(Seq("x"), Seq("S" -> Seq(labelSst(0, 0, 0))))
    val biff5 = wb.clone()
    biff5(4) = 0x00; biff5(5) = 0x05 // vers field of the first BOF
    val e = intercept[UnsupportedOperationException] {
      XlsReader.parseBytes(cfb(biff5))
    }
    assert(e.getMessage.contains("BIFF8"))
  }

  test(".xls flows through the full ingest pipeline") {
    val sst = Seq("id", "name", "n1", "n2")
    val sheet = Seq(
      labelSst(0, 0, 0), labelSst(0, 1, 1),
      number(1, 0, 1), label(1, 1, "n_one"),
      number(2, 0, 2), label(2, 1, "n_two"))
    val dir = Files.createTempDirectory("xls")
    val path = dir.resolve("mini_book.xls")
    Files.write(path, cfb(workbook(sst, Seq("Sheet1" -> sheet))))
    val out = dir.resolve("out").toString
    val report = graft.pipeline.Ingest.processObject(spark, path.toString, out, "ds")
    assert(report.errors.isEmpty, report.errors.mkString("; "))
    assert(report.loaded.map(_.name) == Seq("mini_book_Sheet1"))
    val df = spark.read.parquet(s"$out/mini_book_Sheet1")
    assert(df.columns.toSeq == Seq("id", "name"))
    assert(df.count() == 2)
  }
}

/** Independent BIFF8 + CFB writer, following the public specs — the
  * reader is tested against this layout, not against itself.
  */
object XlsFixture {
  def u16(v: Int): Array[Byte] =
    ByteBuffer.allocate(2).order(ByteOrder.LITTLE_ENDIAN).putShort(v.toShort).array()
  def u32(v: Long): Array[Byte] =
    ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(v.toInt).array()
  def f64(v: Double): Array[Byte] =
    ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN).putDouble(v).array()

  def rec(id: Int, data: Array[Byte]): Array[Byte] = u16(id) ++ u16(data.length) ++ data

  /** XLUnicodeString body (cch already written by caller as u8/u16):
    * compressed single-byte form when all chars fit, else wide UTF-16LE
    * with flags bit 0 set.
    */
  def xlChars(s: String): Array[Byte] =
    if (s.forall(_ <= 0xFF)) Array(0.toByte) ++ s.map(_.toByte).toArray
    else Array(1.toByte) ++ s.getBytes("UTF-16LE")

  private def cellHead(row: Int, col: Int): Array[Byte] = u16(row) ++ u16(col) ++ u16(0)

  def labelSst(row: Int, col: Int, isst: Int): Array[Byte] =
    rec(0x00FD, cellHead(row, col) ++ u32(isst))
  def number(row: Int, col: Int, v: Double): Array[Byte] =
    rec(0x0203, cellHead(row, col) ++ f64(v))
  def rkInt(row: Int, col: Int, v: Int): Array[Byte] =
    rec(0x027E, cellHead(row, col) ++ u32((v.toLong << 2) | 2L))
  def rkInt100(row: Int, col: Int, vTimes100: Int): Array[Byte] =
    rec(0x027E, cellHead(row, col) ++ u32((vTimes100.toLong << 2) | 3L))
  def rkDouble(row: Int, col: Int, v: Double): Array[Byte] = {
    val top30 = (java.lang.Double.doubleToLongBits(v) >>> 32) & 0xFFFFFFFCL
    rec(0x027E, cellHead(row, col) ++ u32(top30))
  }
  def mulRk(row: Int, colFirst: Int, ints: Seq[Int]): Array[Byte] = {
    val body = u16(row) ++ u16(colFirst) ++
      ints.toArray.flatMap(v => u16(0) ++ u32((v.toLong << 2) | 2L)) ++
      u16(colFirst + ints.length - 1)
    rec(0x00BD, body)
  }
  def label(row: Int, col: Int, s: String): Array[Byte] =
    rec(0x0204, cellHead(row, col) ++ u16(s.length) ++ xlChars(s))
  def boolErr(row: Int, col: Int, v: Boolean): Array[Byte] =
    rec(0x0205, cellHead(row, col) ++ Array[Byte](if (v) 1 else 0, 0))
  def formulaNum(row: Int, col: Int, v: Double): Array[Byte] =
    rec(0x0006, cellHead(row, col) ++ f64(v) ++ u16(0) ++ u32(0) ++ u16(0))
  def formulaStr(row: Int, col: Int): Array[Byte] =
    rec(0x0006, cellHead(row, col) ++
      Array[Byte](0, 0, 0, 0, 0, 0, -1, -1) ++ u16(0) ++ u32(0) ++ u16(0))
  def stringRec(s: String): Array[Byte] =
    rec(0x0207, u16(s.length) ++ Array(0.toByte) ++ s.getBytes("ISO-8859-1"))

  private def bof(substreamType: Int): Array[Byte] =
    rec(0x0809, u16(0x0600) ++ u16(substreamType) ++ u16(0) ++ u16(0) ++ u32(0) ++ u32(0))
  private val eof = rec(0x000A, Array.emptyByteArray)

  private def sstRecord(strings: Seq[String]): Array[Byte] = {
    val b = new ByteArrayOutputStream()
    b.writeBytes(u32(strings.length)); b.writeBytes(u32(strings.length))
    strings.foreach { s =>
      b.writeBytes(u16(s.length)); b.writeBytes(xlChars(s))
    }
    rec(0x00FC, b.toByteArray)
  }

  def workbook(sst: Seq[String], sheets: Seq[(String, Seq[Array[Byte]])]): Array[Byte] =
    workbookRaw(if (sst.isEmpty) Array.emptyByteArray else sstRecord(sst), sheets)

  /** Globals (BOF + BOUNDSHEETs + given SST bytes + EOF), then sheet
    * substreams; BOUNDSHEET offsets backpatched after layout.
    */
  def workbookRaw(sstBytes: Array[Byte], sheets: Seq[(String, Seq[Array[Byte]])]): Array[Byte] = {
    def boundsheet(name: String): Array[Byte] =
      rec(0x0085, u32(0) ++ Array[Byte](0, 0) ++
        Array(name.length.toByte, 0.toByte) ++ name.getBytes("ISO-8859-1"))
    val globals = bof(0x0005) ++
      sheets.toArray.flatMap(s => boundsheet(s._1)) ++ sstBytes ++ eof
    val streams = sheets.map { case (_, cells) =>
      bof(0x0010) ++ cells.toArray.flatten ++ eof
    }
    // backpatch each BOUNDSHEET's lbPlyPos (u32 right after the record header)
    val offsets = streams.scanLeft(globals.length)(_ + _.length)
    val out = globals ++ streams.toArray.flatten
    var p = 0
    var sheetIdx = 0
    while (p + 4 <= out.length) {
      val id = (out(p) & 0xFF) | ((out(p + 1) & 0xFF) << 8)
      val len = (out(p + 2) & 0xFF) | ((out(p + 3) & 0xFF) << 8)
      if (id == 0x0085) {
        val off = u32(offsets(sheetIdx))
        System.arraycopy(off, 0, out, p + 4, 4)
        sheetIdx += 1
      }
      p += 4 + len
    }
    out
  }

  // ---- CFB container ------------------------------------------------

  private val FREE = 0xFFFFFFFFL
  private val END = 0xFFFFFFFEL
  private val FATSECT = 0xFFFFFFFDL

  private def dirEntry(name: String, objType: Int, child: Long,
      start: Long, size: Long): Array[Byte] = {
    val e = ByteBuffer.allocate(128).order(ByteOrder.LITTLE_ENDIAN)
    val n = name.getBytes("UTF-16LE")
    e.put(n, 0, math.min(n.length, 62))
    e.putShort(64, ((math.min(name.length, 31) + 1) * 2).toShort)
    e.put(66, objType.toByte)
    e.put(67, 1.toByte)
    e.putInt(68, FREE.toInt); e.putInt(72, FREE.toInt); e.putInt(76, child.toInt)
    e.putInt(116, start.toInt)
    e.putLong(120, size)
    e.array()
  }

  private def header(nFat: Int, firstDir: Int, firstMiniFat: Long, nMiniFat: Int,
      difat0: Long): Array[Byte] = {
    val h = ByteBuffer.allocate(512).order(ByteOrder.LITTLE_ENDIAN)
    h.putLong(0, 0xE11AB1A1E011CFD0L)
    h.putShort(24, 0x003E.toShort); h.putShort(26, 3.toShort)
    h.putShort(28, 0xFFFE.toShort)
    h.putShort(30, 9.toShort); h.putShort(32, 6.toShort)
    h.putInt(40, 0)
    h.putInt(44, nFat)
    h.putInt(48, firstDir)
    h.putInt(56, 4096)
    h.putInt(60, firstMiniFat.toInt); h.putInt(64, nMiniFat)
    h.putInt(68, END.toInt); h.putInt(72, 0)
    h.putInt(76, difat0.toInt)
    (1 until 109).foreach(i => h.putInt(76 + i * 4, FREE.toInt))
    h.array()
  }

  private def fatSector(entries: Seq[Long]): Array[Byte] = {
    val b = ByteBuffer.allocate(512).order(ByteOrder.LITTLE_ENDIAN)
    entries.take(128).zipWithIndex.foreach { case (v, i) => b.putInt(i * 4, v.toInt) }
    (entries.length until 128).foreach(i => b.putInt(i * 4, FREE.toInt))
    b.array()
  }

  private def pad(data: Array[Byte], unit: Int): Array[Byte] = {
    val n = ((data.length + unit - 1) / unit) * unit
    java.util.Arrays.copyOf(data, n)
  }

  /** Workbook under the 4096 cutoff → mini-stream layout; else a plain
    * FAT chain. Sector plan (mini): 0=FAT 1=DIR 2=miniFAT 3..=container.
    * Sector plan (regular): 0=FAT 1=DIR 2..=workbook.
    */
  def cfb(wb: Array[Byte]): Array[Byte] = {
    if (wb.length < 4096) {
      val container = pad(wb, 64)
      val nMini = container.length / 64
      val contSectors = pad(container, 512).length / 512
      val fat = Seq(FATSECT, END, END) ++
        (0 until contSectors).map(i => if (i == contSectors - 1) END else (4L + i))
      val dir = pad(
        dirEntry("Root Entry", 5, 1, 3, container.length) ++
          dirEntry("Workbook", 2, FREE, 0, wb.length) , 512)
      val miniFat = fatSector(
        (0 until nMini).map(i => if (i == nMini - 1) END else (i + 1L)))
      header(1, 1, 2, 1, 0) ++ fatSector(fat) ++ dir ++ miniFat ++ pad(container, 512)
    } else {
      val body = pad(wb, 512)
      val nWb = body.length / 512
      require(nWb + 2 <= 128, "fixture too large for a one-sector FAT")
      val fat = Seq(FATSECT, END) ++
        (0 until nWb).map(i => if (i == nWb - 1) END else (3L + i))
      val dir = pad(
        dirEntry("Root Entry", 5, 1, END, 0) ++
          dirEntry("Workbook", 2, FREE, 2, wb.length), 512)
      header(1, 1, END, 0, 0) ++ fatSector(fat) ++ dir ++ body
    }
  }
}
