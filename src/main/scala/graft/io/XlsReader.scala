package graft.io

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import graft.grid.Grid

/** Minimal legacy .xls (BIFF8) workbook reader — closes the one format
  * gap vs the reference, which reads .xls through pandas+xlrd
  * (etl.py:527,544,564). Built from the public MS-CFB and MS-XLS
  * specifications on plain JDK, like [[XlsxReader]] (no POI in this
  * offline environment).
  *
  * Two layers:
  *  - CFB container: sector FAT (+ DIFAT chain), directory, and the
  *    mini-stream/mini-FAT path for streams under the 4096-byte cutoff
  *    — the Workbook stream of a small file lives there.
  *  - BIFF8 records: globals substream (SST shared strings with
  *    CONTINUE splits and per-segment option-flag bytes, BOUNDSHEET
  *    offsets), then one substream per sheet with LABELSST / NUMBER /
  *    RK / MULRK / LABEL / BOOLERR / FORMULA(+STRING) cells.
  *
  * Like the XLSX path, every cell lands as a STRING in the grid IR
  * (dense row-major, gaps null) and the downstream detect→clean→infer
  * pipeline is distributed; only the workbook parse is driver-side,
  * exactly like the reference's pandas read.
  */
object XlsReader {

  def readWorkbook(spark: SparkSession, path: String): Map[String, Grid] = {
    val sheets = parseBytes(Files.readAllBytes(Paths.get(path)))
    sheets.map { case (name, rows) => name -> Grid.fromRows(spark, rows) }.toMap
  }

  /** (sheet name → dense row grid), in workbook order. */
  private[io] def parseBytes(bytes: Array[Byte]): Seq[(String, Seq[Seq[String]])] = {
    val wb = new Cfb(bytes).stream(Set("Workbook", "Book"))
    parseWorkbookStream(wb)
  }

  // ------------------------------------------------------------------
  // CFB container (MS-CFB)
  // ------------------------------------------------------------------

  private final val FREESECT = 0xFFFFFFFF
  private final val ENDOFCHAIN = 0xFFFFFFFE

  private final class Cfb(bytes: Array[Byte]) {
    private val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(bytes.length >= 512 &&
      buf.getLong(0) == 0xE11AB1A1E011CFD0L, "not a CFB (.xls) file")

    private val sectorSize = 1 << (buf.getShort(30) & 0xFFFF)
    private val miniSize = 1 << (buf.getShort(32) & 0xFFFF)
    private val nFat = buf.getInt(44)
    private val firstDir = buf.getInt(48)
    private val miniCutoff = buf.getInt(56)
    private val firstMiniFat = buf.getInt(60)
    private val nMiniFat = buf.getInt(64)
    private val firstDifat = buf.getInt(68)
    private val nDifat = buf.getInt(72)

    private def sector(idx: Int): Array[Byte] = {
      val off = 512 + idx.toLong * sectorSize
      java.util.Arrays.copyOfRange(bytes, off.toInt,
        math.min(bytes.length, off.toInt + sectorSize))
    }

    /** FAT sector list: 109 header DIFAT slots, then the DIFAT chain
      * (each DIFAT sector holds sectorSize/4 − 1 entries + next ptr).
      */
    private val fatSectors: Seq[Int] = {
      val out = Seq.newBuilder[Int]
      var taken = 0
      var i = 0
      while (i < 109 && taken < nFat) {
        val s = buf.getInt(76 + i * 4)
        if (s != FREESECT) { out += s; taken += 1 }
        i += 1
      }
      var difat = firstDifat
      var guard = 0
      while (taken < nFat && difat != ENDOFCHAIN && difat != FREESECT && guard <= nDifat) {
        val d = ByteBuffer.wrap(sector(difat)).order(ByteOrder.LITTLE_ENDIAN)
        val perSector = sectorSize / 4 - 1
        var j = 0
        while (j < perSector && taken < nFat) {
          val s = d.getInt(j * 4)
          if (s != FREESECT) { out += s; taken += 1 }
          j += 1
        }
        difat = d.getInt(perSector * 4)
        guard += 1
      }
      out.result()
    }

    private val fat: IndexedSeq[Int] = fatSectors.flatMap { s =>
      val d = ByteBuffer.wrap(sector(s)).order(ByteOrder.LITTLE_ENDIAN)
      (0 until sectorSize / 4).map(i => d.getInt(i * 4))
    }.toIndexedSeq

    /** Follow a FAT chain, truncating the concatenation to `size`. */
    private def chain(start: Int, size: Long): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      var s = start
      var guard = 0
      while (s != ENDOFCHAIN && s != FREESECT && s >= 0 && guard < fat.length + 2) {
        out.write(sector(s))
        s = if (s < fat.length) fat(s) else ENDOFCHAIN
        guard += 1
      }
      val all = out.toByteArray
      java.util.Arrays.copyOfRange(all, 0, math.min(size, all.length.toLong).toInt)
    }

    private final case class DirEntry(name: String, objType: Int, start: Int, size: Long)

    private val dirEntries: Seq[DirEntry] = {
      val d = chain(firstDir, Long.MaxValue)
      (0 until d.length / 128).map { i =>
        val e = ByteBuffer.wrap(d, i * 128, 128).order(ByteOrder.LITTLE_ENDIAN)
        val nameLen = e.getShort(i * 128 + 64) & 0xFFFF // bytes incl. terminator
        val name = if (nameLen >= 2)
          new String(d, i * 128, nameLen - 2, java.nio.charset.StandardCharsets.UTF_16LE)
        else ""
        DirEntry(name, d(i * 128 + 66) & 0xFF,
          e.getInt(i * 128 + 116), e.getLong(i * 128 + 120) & 0xFFFFFFFFL)
      }
    }

    private lazy val miniFat: IndexedSeq[Int] = {
      val d = chain(firstMiniFat, nMiniFat.toLong * sectorSize)
      val b = ByteBuffer.wrap(d).order(ByteOrder.LITTLE_ENDIAN)
      (0 until d.length / 4).map(i => b.getInt(i * 4))
    }

    /** The root entry's stream is the mini-stream container. */
    private lazy val miniContainer: Array[Byte] = {
      val root = dirEntries.find(_.objType == 5)
        .getOrElse(throw new IllegalArgumentException("CFB: no root entry"))
      chain(root.start, root.size)
    }

    private def miniChain(start: Int, size: Long): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      var s = start
      var guard = 0
      while (s != ENDOFCHAIN && s != FREESECT && s >= 0 && guard < miniFat.length + 2) {
        val off = s * miniSize
        out.write(java.util.Arrays.copyOfRange(miniContainer, off,
          math.min(miniContainer.length, off + miniSize)))
        s = if (s < miniFat.length) miniFat(s) else ENDOFCHAIN
        guard += 1
      }
      val all = out.toByteArray
      java.util.Arrays.copyOfRange(all, 0, math.min(size, all.length.toLong).toInt)
    }

    def stream(names: Set[String]): Array[Byte] = {
      val e = dirEntries.find(d => d.objType == 2 && names.contains(d.name))
        .getOrElse(throw new IllegalArgumentException(
          s"CFB: no stream named ${names.mkString("/")} " +
            s"(have: ${dirEntries.filter(_.objType == 2).map(_.name).mkString(", ")})"))
      if (e.size < miniCutoff) miniChain(e.start, e.size)
      else chain(e.start, e.size)
    }
  }

  // ------------------------------------------------------------------
  // BIFF8 records (MS-XLS)
  // ------------------------------------------------------------------

  private final val RT_BOF = 0x0809
  private final val RT_EOF = 0x000A
  private final val RT_BOUNDSHEET = 0x0085
  private final val RT_SST = 0x00FC
  private final val RT_CONTINUE = 0x003C
  private final val RT_LABELSST = 0x00FD
  private final val RT_NUMBER = 0x0203
  private final val RT_RK = 0x027E
  private final val RT_MULRK = 0x00BD
  private final val RT_LABEL = 0x0204
  private final val RT_BOOLERR = 0x0205
  private final val RT_FORMULA = 0x0006
  private final val RT_STRING = 0x0207

  private final case class Rec(id: Int, off: Int, len: Int)

  /** Cursor over one record + its CONTINUE records. String character
    * data may split at a segment boundary, where the next segment
    * restarts with a fresh option-flags byte (the compressed/wide bit
    * may flip mid-string) — everything else reads linearly.
    */
  private final class Cursor(data: Array[Byte], segs: IndexedSeq[Rec]) {
    private var seg = 0
    private var pos = 0
    private def segRemaining: Int = segs(seg).len - pos
    private def advanceIfDone(): Unit =
      while (seg < segs.length - 1 && segRemaining == 0) { seg += 1; pos = 0 }
    def hasMore: Boolean = { advanceIfDone(); segRemaining > 0 }
    def u8(): Int = { advanceIfDone(); val v = data(segs(seg).off + pos) & 0xFF; pos += 1; v }
    def u16(): Int = u8() | (u8() << 8)
    def u32(): Long = (u16().toLong | (u16().toLong << 16)) & 0xFFFFFFFFL
    def f64(): Double = {
      var bits = 0L
      var i = 0
      while (i < 8) { bits |= (u8().toLong << (8 * i)); i += 1 }
      java.lang.Double.longBitsToDouble(bits)
    }
    def skip(n: Long): Unit = {
      var left = n
      while (left > 0) {
        advanceIfDone()
        val take = math.min(left, segRemaining.toLong).toInt
        pos += take; left -= take
        if (take == 0) return // truncated stream: stop rather than spin
      }
    }
    /** XLUnicodeRichExtendedString: cch chars under a flags byte that is
      * re-stated whenever character data crosses a CONTINUE boundary
      * (the compressed/wide bit may flip per segment).
      */
    def xlString(cch: Int, flags0: Int): String = {
      var wide = (flags0 & 1) != 0
      val rich = (flags0 & 8) != 0
      val ext = (flags0 & 4) != 0
      val cRun = if (rich) u16() else 0
      val cbExt = if (ext) u32() else 0L
      advanceIfDone()
      var charSeg = seg
      val sb = new StringBuilder(cch)
      var i = 0
      while (i < cch) {
        advanceIfDone()
        if (segRemaining == 0) return sb.toString // truncated
        if (seg != charSeg) { wide = (u8() & 1) != 0; charSeg = seg }
        val c = if (wide) u16() else u8()
        sb.append(c.toChar)
        i += 1
      }
      skip(4L * cRun + cbExt)
      sb.toString
    }
  }

  private def records(data: Array[Byte]): IndexedSeq[Rec] = {
    val out = IndexedSeq.newBuilder[Rec]
    var p = 0
    while (p + 4 <= data.length) {
      val id = (data(p) & 0xFF) | ((data(p + 1) & 0xFF) << 8)
      val len = (data(p + 2) & 0xFF) | ((data(p + 3) & 0xFF) << 8)
      out += Rec(id, p + 4, math.min(len, data.length - p - 4))
      p += 4 + len
    }
    out.result()
  }

  /** "1015.0" noise hurts schema inference: integral doubles print as
    * integers (the same text a CSV or XLSX cell would carry).
    */
  private def numStr(d: Double): String =
    if (d == math.rint(d) && math.abs(d) < 1e15) d.toLong.toString else d.toString

  /** RK value: bit0 = ÷100, bit1 = 30-bit int vs top-30-bits-of-double. */
  private def rkValue(rk: Long): Double = {
    val base =
      if ((rk & 2L) != 0) (rk.toInt >> 2).toDouble
      else java.lang.Double.longBitsToDouble((rk & 0xFFFFFFFCL) << 32)
    if ((rk & 1L) != 0) base / 100.0 else base
  }

  private def parseWorkbookStream(wb: Array[Byte]): Seq[(String, Seq[Seq[String]])] = {
    val recs = records(wb)

    // BIFF version guard: BIFF5/BIFF7 (Excel 5.0/95) store strings and
    // the SST differently — parsing them with BIFF8 rules would yield
    // garbage, so fail loudly instead (the reference's xlrd handles
    // those; conversion to .xlsx is the documented path)
    recs.headOption.filter(_.id == RT_BOF).foreach { r =>
      val vers = (wb(r.off) & 0xFF) | ((wb(r.off + 1) & 0xFF) << 8)
      if (vers != 0x0600)
        throw new UnsupportedOperationException(
          f"BIFF version 0x$vers%04x is not BIFF8 (Excel 97+); " +
            "convert older .xls files to .xlsx")
    }

    // globals: SST (+ CONTINUEs) and BOUNDSHEET sheet directory
    var sst = IndexedSeq.empty[String]
    val sheets = Seq.newBuilder[(String, Int)] // (name, stream offset of sheet BOF)
    var i = 0
    var depth = 0
    while (i < recs.length && depth >= 0) {
      val r = recs(i)
      r.id match {
        case RT_BOF => depth += 1
        case RT_EOF => depth -= 1; if (depth == 0) i = recs.length // globals done
        case RT_SST =>
          val segs = IndexedSeq.newBuilder[Rec]
          segs += r
          var j = i + 1
          while (j < recs.length && recs(j).id == RT_CONTINUE) { segs += recs(j); j += 1 }
          val cur = new Cursor(wb, segs.result())
          cur.u32() // total refs
          val unique = cur.u32()
          val out = IndexedSeq.newBuilder[String]
          var k = 0L
          while (k < unique && cur.hasMore) {
            val cch = cur.u16()
            val flags = cur.u8()
            out += cur.xlString(cch, flags)
            k += 1
          }
          sst = out.result()
        case RT_BOUNDSHEET =>
          val cur = new Cursor(wb, IndexedSeq(r))
          val bofOff = cur.u32()
          cur.skip(2) // visibility + type
          val cch = cur.u8()
          val flags = cur.u8()
          sheets += cur.xlString(cch, flags) -> bofOff.toInt
        case _ =>
      }
      i += 1
    }

    sheets.result().map { case (name, off) => name -> parseSheet(wb, recs, off, sst) }
  }

  private def parseSheet(wb: Array[Byte], recs: IndexedSeq[Rec], bofOff: Int,
      sst: IndexedSeq[String]): Seq[Seq[String]] = {
    val cells = scala.collection.mutable.Map.empty[(Int, Int), String]
    def put(row: Int, c: Int, v: String): Unit =
      if (v != null && v.nonEmpty) cells((row, c)) = v

    var i = recs.indexWhere(r => r.off - 4 == bofOff)
    if (i < 0) return Seq.empty
    var depth = 0
    var pendingString: Option[(Int, Int)] = None // FORMULA whose value is the next STRING
    while (i < recs.length && depth >= 0) {
      val r = recs(i)
      val cur = new Cursor(wb, IndexedSeq(r))
      r.id match {
        case RT_BOF => depth += 1
        case RT_EOF => depth -= 1; if (depth == 0) i = recs.length
        case RT_LABELSST =>
          val row = cur.u16(); val c = cur.u16(); cur.skip(2)
          val idx = cur.u32().toInt
          if (idx >= 0 && idx < sst.length) put(row, c, sst(idx))
        case RT_NUMBER =>
          val row = cur.u16(); val c = cur.u16(); cur.skip(2)
          put(row, c, numStr(cur.f64()))
        case RT_RK =>
          val row = cur.u16(); val c = cur.u16(); cur.skip(2)
          put(row, c, numStr(rkValue(cur.u32())))
        case RT_MULRK =>
          val row = cur.u16(); val first = cur.u16()
          val n = (r.len - 6) / 6 // 2(row)+2(colFirst)+n*6+2(colLast)
          var k = 0
          while (k < n) {
            cur.skip(2) // xf
            put(row, first + k, numStr(rkValue(cur.u32())))
            k += 1
          }
        case RT_LABEL => // BIFF8 inline string cell
          val row = cur.u16(); val c = cur.u16(); cur.skip(2)
          val cch = cur.u16(); val flags = cur.u8()
          put(row, c, cur.xlString(cch, flags))
        case RT_BOOLERR =>
          val row = cur.u16(); val c = cur.u16(); cur.skip(2)
          val v = cur.u8(); val isErr = cur.u8()
          if (isErr == 0) put(row, c, if (v != 0) "TRUE" else "FALSE")
        case RT_FORMULA =>
          val row = cur.u16(); val c = cur.u16(); cur.skip(2)
          val b = Array.fill(8)(cur.u8())
          if (b(6) == 0xFF && b(7) == 0xFF) b(0) match {
            case 0 => pendingString = Some((row, c)) // cached text follows in STRING
            case 1 => put(row, c, if (b(2) != 0) "TRUE" else "FALSE")
            case _ => // error / empty-string result: leave the cell blank
          } else {
            var bits = 0L
            var k = 0
            while (k < 8) { bits |= (b(k).toLong << (8 * k)); k += 1 }
            put(row, c, numStr(java.lang.Double.longBitsToDouble(bits)))
          }
        case RT_STRING =>
          pendingString.foreach { case (row, c) =>
            val cch = cur.u16(); val flags = cur.u8()
            put(row, c, cur.xlString(cch, flags))
          }
          pendingString = None
        case _ =>
      }
      i += 1
    }

    if (cells.isEmpty) return Seq.empty
    val maxRow = cells.keys.map(_._1).max
    val maxCol = cells.keys.map(_._2).max
    (0 to maxRow).map(ri => (0 to maxCol).map(ci => cells.getOrElse((ri, ci), null)))
  }
}
