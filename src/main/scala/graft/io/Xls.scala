package graft.io

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** S12 — native legacy Excel (`.xls`, BIFF8 in an OLE2/CFB compound
  * file) sheet reader, no external libraries: the container is the
  * Compound File Binary format (MS-CFB — FAT-chained 512-byte sectors,
  * a mini-FAT for small streams) and the payload is the `Workbook`
  * stream of BIFF8 records (MS-XLS). The JDK byte tooling covers the
  * whole surface a catalog/dimension workbook uses: BOUNDSHEET sheet
  * directory, the shared-string table (SST + CONTINUE continuation with
  * mid-string re-specified compression), LABELSST/LABEL text cells,
  * NUMBER/RK/MULRK numerics, BOOLERR booleans, and cached FORMULA
  * results.
  *
  * Reference file this exists for: `docs/ads_revenue.xls` — the revenue
  * catalog whose sheet `ads_revenue_0821` documents the q55-q57 table
  * schemas (rows 34-75). Until this reader those schemas were
  * hand-transcribed constants; XlsSpec now checks them against the
  * actual parsed catalog.
  *
  * Scale stance: identical to [[Xlsx]] — dimension/catalog workbooks
  * are driver-sized by definition; the file is parsed on the driver and
  * handed to the cluster as a local relation. Output contract is also
  * identical: all-string columns named by the first non-empty row,
  * numbers as text (integral values without a decimal point), booleans
  * as "true"/"false", missing cells NULL.
  */
object Xls {

  // ---------- OLE2 / CFB container ----------

  private final val FreeSect = 0xFFFFFFFFL
  private final val EndOfChain = 0xFFFFFFFEL

  private final class Cfb(bytes: Array[Byte]) {
    private val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(bytes.length >= 512 &&
      bb.getLong(0) == 0xE11AB1A1E011CFD0L, // D0 CF 11 E0 A1 B1 1A E1 LE
      "not an OLE2 compound file (bad signature)")
    private val sectorShift = bb.getShort(30).toInt
    private val miniShift = bb.getShort(32).toInt
    require(sectorShift == 9 || sectorShift == 12,
      s"unsupported CFB sector shift $sectorShift")
    private val sz = 1 << sectorShift
    private val miniSz = 1 << miniShift
    private val numFat = bb.getInt(44)
    private val firstDir = bb.getInt(48)
    private val miniCutoff = bb.getInt(56)
    private val firstMiniFat = bb.getInt(60)
    private val firstDifat = bb.getInt(68)

    private def sector(id: Int): Array[Byte] = {
      // MS-CFB 2.2: sector n starts at (n+1) << sectorShift — the
      // 512-byte header occupies "sector -1". For V3 (512-byte
      // sectors) this equals 512 + n·512; for V4 (4096) the header is
      // PADDED to a full sector, so sector 0 begins at 4096, not 512.
      val off = (id.toLong + 1) << sectorShift
      require(off + sz <= bytes.length, s"sector $id past end of file")
      java.util.Arrays.copyOfRange(bytes, off.toInt, off.toInt + sz)
    }
    private def u32(a: Array[Byte], i: Int): Long =
      ByteBuffer.wrap(a, i, 4).order(ByteOrder.LITTLE_ENDIAN).getInt.toLong & 0xFFFFFFFFL

    // FAT sector list: 109 header DIFAT slots, then chained DIFAT sectors
    private val fatSectors: Seq[Int] = {
      val out = mutable.ArrayBuffer.empty[Int]
      var i = 0
      while (i < 109 && out.size < numFat) {
        val v = bb.getInt(76 + 4 * i).toLong & 0xFFFFFFFFL
        if (v != FreeSect) out += v.toInt
        i += 1
      }
      var difat = firstDifat.toLong & 0xFFFFFFFFL
      while (difat != EndOfChain && difat != FreeSect && out.size < numFat) {
        val s = sector(difat.toInt)
        var j = 0
        while (j < sz / 4 - 1 && out.size < numFat) {
          val v = u32(s, 4 * j)
          if (v != FreeSect) out += v.toInt
          j += 1
        }
        difat = u32(s, sz - 4)
      }
      out.toSeq
    }
    private val fat: Array[Long] = {
      val all = fatSectors.flatMap { s =>
        val a = sector(s); (0 until sz / 4).map(i => u32(a, 4 * i))
      }
      all.toArray
    }

    private def chain(start: Int, limit: Int): Seq[Int] = {
      val out = mutable.ArrayBuffer.empty[Int]
      var s = start.toLong & 0xFFFFFFFFL
      while (s != EndOfChain && s != FreeSect) {
        require(s < fat.length, s"FAT chain walks off the table at $s")
        require(out.size <= limit, "cyclic FAT chain")
        out += s.toInt
        s = fat(s.toInt)
      }
      out.toSeq
    }

    private def readChain(start: Int, size: Long): Array[Byte] = {
      val need = size.toInt
      val secs = chain(start, need / sz + 2)
      val out = new Array[Byte](need)
      var off = 0
      secs.foreach { s =>
        val a = sector(s)
        val k = math.min(sz, need - off)
        if (k > 0) System.arraycopy(a, 0, out, off, k)
        off += k
      }
      out
    }

    final case class Entry(name: String, entryType: Int, start: Int, size: Long)

    val entries: Seq[Entry] = {
      // directory stream size is not in the header; walk its chain fully
      val secs = chain(firstDir, bytes.length / sz + 2)
      val dir = secs.flatMap(sector).toArray
      (0 until dir.length / 128).flatMap { i =>
        val off = i * 128
        val nlen = ByteBuffer.wrap(dir, off + 64, 2)
          .order(ByteOrder.LITTLE_ENDIAN).getShort.toInt
        if (nlen < 2) None
        else Some(Entry(
          new String(dir, off, nlen - 2, java.nio.charset.StandardCharsets.UTF_16LE),
          dir(off + 66).toInt,
          ByteBuffer.wrap(dir, off + 116, 4).order(ByteOrder.LITTLE_ENDIAN).getInt,
          ByteBuffer.wrap(dir, off + 120, 4).order(ByteOrder.LITTLE_ENDIAN).getInt.toLong & 0xFFFFFFFFL))
      }
    }

    // mini-FAT + the root entry's mini-stream (streams under the cutoff
    // live in 64-byte mini sectors carved out of the root's chain)
    private lazy val miniFat: Array[Long] = {
      val numMiniFat = bb.getInt(64)
      if (numMiniFat == 0) Array.emptyLongArray
      else {
        val secs = chain(firstMiniFat, numMiniFat + 1)
        secs.flatMap { s =>
          val a = sector(s); (0 until sz / 4).map(i => u32(a, 4 * i))
        }.toArray
      }
    }
    private lazy val miniStream: Array[Byte] = {
      val root = entries.find(_.entryType == 5)
        .getOrElse(throw new IllegalArgumentException("CFB has no root entry"))
      readChain(root.start, root.size)
    }

    def readStream(e: Entry): Array[Byte] =
      if (e.size >= miniCutoff) readChain(e.start, e.size)
      else {
        val need = e.size.toInt
        val out = new Array[Byte](need)
        var s = e.start.toLong & 0xFFFFFFFFL
        var off = 0
        while (s != EndOfChain && s != FreeSect && off < need) {
          require(s < miniFat.length, s"mini-FAT chain walks off the table at $s")
          val k = math.min(miniSz, need - off)
          System.arraycopy(miniStream, s.toInt * miniSz, out, off, k)
          off += k
          s = miniFat(s.toInt)
        }
        out
      }
  }

  private def workbookStream(path: String): Array[Byte] = {
    val cfb = new Cfb(Files.readAllBytes(Paths.get(path)))
    val wb = cfb.entries.find(e => e.entryType == 2 &&
        (e.name == "Workbook" || e.name == "Book"))
      .getOrElse(throw new IllegalArgumentException(
        s"$path: no Workbook/Book stream — not a BIFF xls"))
    cfb.readStream(wb)
  }

  // ---------- BIFF8 records ----------

  private final val RecBof = 0x0809
  private final val RecEof = 0x000A
  private final val RecBoundSheet = 0x0085
  private final val RecSst = 0x00FC
  private final val RecContinue = 0x003C
  private final val RecLabelSst = 0x00FD
  private final val RecLabel = 0x0204
  private final val RecNumber = 0x0203
  private final val RecRk = 0x027E
  private final val RecMulRk = 0x00BD
  private final val RecBoolErr = 0x0205
  private final val RecFormula = 0x0006
  private final val RecString = 0x0207

  private final case class Rec(typ: Int, off: Int, len: Int)

  private def u16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8)
  private def u32At(b: Array[Byte], i: Int): Int =
    u16(b, i) | (u16(b, i + 2) << 16)

  /** Walk records from `start` until the matching substream EOF. */
  private def recordsFrom(wb: Array[Byte], start: Int): Seq[Rec] = {
    val out = mutable.ArrayBuffer.empty[Rec]
    var i = start
    var sawBof = false
    while (i + 4 <= wb.length) {
      val typ = u16(wb, i); val len = u16(wb, i + 2)
      out += Rec(typ, i + 4, len)
      i += 4 + len
      if (typ == RecBof) sawBof = true
      if (typ == RecEof && sawBof) return out.toSeq
    }
    out.toSeq
  }

  /** Cursor over the byte ranges of SST + CONTINUE records: an
    * XLUnicodeString may split at a record boundary, where the
    * continuation RE-SPECIFIES the compression flag for the remaining
    * characters (the one genuinely tricky rule in BIFF8 strings). */
  private final class SegReader(wb: Array[Byte], segs: Seq[(Int, Int)]) {
    private var si = 0
    private var p = segs.head._1
    private def segEnd = segs(si)._1 + segs(si)._2
    def atBoundary: Boolean = p == segEnd
    private def advance(): Unit = { si += 1; p = segs(si)._1 }
    def u8(): Int = { if (atBoundary) advance(); val v = wb(p) & 0xFF; p += 1; v }
    def u16v(): Int = u8() | (u8() << 8)
    def u32v(): Long = (u16v().toLong | (u16v().toLong << 16)) & 0xFFFFFFFFL
    def remaining: Int = segEnd - p
    def take(n: Int): Array[Byte] = {
      val out = new Array[Byte](n)
      var got = 0
      while (got < n) {
        if (atBoundary) advance()
        val k = math.min(n - got, remaining)
        System.arraycopy(wb, p, out, got, k)
        p += k; got += k
      }
      out
    }
    /** One XLUnicodeString (16-bit length form). */
    def xlString(): String = {
      val cch = u16v()
      var grbit = u8()
      val crun = if ((grbit & 0x08) != 0) u16v() else 0
      val cbext = if ((grbit & 0x04) != 0) u32v() else 0L
      val sb = new java.lang.StringBuilder(cch)
      var need = cch
      while (need > 0) {
        // characters continuing into a new CONTINUE record are preceded
        // by a FRESH option byte — compression can flip mid-string
        if (atBoundary) { advance(); grbit = u8() }
        val wide = (grbit & 0x01) != 0
        val avail = remaining
        val k = math.min(need, if (wide) avail / 2 else avail)
        require(k > 0, "malformed XLUnicodeString continuation")
        val raw = take(if (wide) k * 2 else k)
        sb.append(new String(raw,
          if (wide) java.nio.charset.StandardCharsets.UTF_16LE
          else java.nio.charset.StandardCharsets.ISO_8859_1))
        need -= k
      }
      var skip = crun * 4L + cbext
      while (skip > 0) { val k = math.min(skip, Int.MaxValue.toLong).toInt; take(k); skip -= k }
      sb.toString
    }
  }

  /** Shared-string table: SST record plus its CONTINUE tail. */
  private def parseSst(wb: Array[Byte], recs: Seq[Rec]): IndexedSeq[String] = {
    val i = recs.indexWhere(_.typ == RecSst)
    if (i < 0) return IndexedSeq.empty
    val segs = mutable.ArrayBuffer((recs(i).off, recs(i).len))
    var j = i + 1
    while (j < recs.length && recs(j).typ == RecContinue) {
      segs += ((recs(j).off, recs(j).len)); j += 1
    }
    val r = new SegReader(wb, segs.toSeq)
    r.u32v() // total refs
    val unique = r.u32v().toInt
    (0 until unique).map(_ => r.xlString())
  }

  /** RK-encoded number: 30-bit payload, bit0 = /100, bit1 = int. */
  private def rkValue(rk: Int): Double = {
    val base =
      if ((rk & 0x02) != 0) (rk >> 2).toDouble
      else java.lang.Double.longBitsToDouble((rk.toLong & 0xFFFFFFFCL) << 32)
    if ((rk & 0x01) != 0) base / 100.0 else base
  }

  /** Numbers as text, matching the Xlsx contract's "raw stored text"
    * spirit: integral doubles print without a decimal point. */
  private def formatNum(d: Double): String =
    if (d == math.rint(d) && !d.isInfinite && math.abs(d) < 1e15) d.toLong.toString
    else d.toString

  private def sheetDirectory(wb: Array[Byte]): Seq[(String, Int)] = {
    val globals = recordsFrom(wb, 0)
    globals.filter(_.typ == RecBoundSheet).map { r =>
      val pos = u32At(wb, r.off)
      val nlen = wb(r.off + 6) & 0xFF
      val wide = (wb(r.off + 7) & 0x01) != 0
      val name =
        if (wide) new String(wb, r.off + 8, nlen * 2,
          java.nio.charset.StandardCharsets.UTF_16LE)
        else new String(wb, r.off + 8, nlen,
          java.nio.charset.StandardCharsets.ISO_8859_1)
      (name, pos)
    }
  }

  /** All sheet names in workbook order. */
  def sheetNames(path: String): Seq[String] =
    sheetDirectory(workbookStream(path)).map(_._1)

  private def parseSheet(path: String, sheet: Option[String]): (Seq[String], Seq[Seq[String]]) = {
    val wb = workbookStream(path)
    val globals = recordsFrom(wb, 0)
    val sst = parseSst(wb, globals)
    val sheets = sheetDirectory(wb)
    require(sheets.nonEmpty, s"$path: workbook has no sheets")
    val (_, pos) = sheet match {
      case None => sheets.head
      case Some(n) => sheets.find(_._1 == n).getOrElse(
        throw new IllegalArgumentException(
          s"$path: no sheet named '$n' (have: ${sheets.map(_._1).mkString(", ")})"))
    }

    val cells = mutable.Map.empty[(Int, Int), String]
    val recs = recordsFrom(wb, pos)
    var k = 0
    while (k < recs.length) {
      val r = recs(k)
      r.typ match {
        case RecLabelSst =>
          cells((u16(wb, r.off), u16(wb, r.off + 2))) = sst(u32At(wb, r.off + 6))
        case RecLabel =>
          val sr = new SegReader(wb, Seq((r.off + 6, r.len - 6)))
          cells((u16(wb, r.off), u16(wb, r.off + 2))) = sr.xlString()
        case RecNumber =>
          val bits = ByteBuffer.wrap(wb, r.off + 6, 8)
            .order(ByteOrder.LITTLE_ENDIAN).getDouble
          cells((u16(wb, r.off), u16(wb, r.off + 2))) = formatNum(bits)
        case RecRk =>
          cells((u16(wb, r.off), u16(wb, r.off + 2))) =
            formatNum(rkValue(u32At(wb, r.off + 6)))
        case RecMulRk =>
          val row = u16(wb, r.off); val colFirst = u16(wb, r.off + 2)
          val nCells = (r.len - 6) / 6
          (0 until nCells).foreach { i =>
            cells((row, colFirst + i)) =
              formatNum(rkValue(u32At(wb, r.off + 4 + 6 * i + 2)))
          }
        case RecBoolErr =>
          val fErr = wb(r.off + 7) & 0xFF
          if (fErr == 0) // error cells stay NULL, like Xlsx "e" cells
            cells((u16(wb, r.off), u16(wb, r.off + 2))) =
              if ((wb(r.off + 6) & 0xFF) != 0) "true" else "false"
        case RecFormula =>
          val row = u16(wb, r.off); val c = u16(wb, r.off + 2)
          // cached result: FF FF in the low bytes marks a special
          // (string/bool/err/blank) result, else it's an IEEE double
          if ((wb(r.off + 12) & 0xFF) == 0xFF && (wb(r.off + 13) & 0xFF) == 0xFF) {
            wb(r.off + 6) & 0xFF match {
              case 0 =>
                // string: the value arrives in the STRING record that
                // IMMEDIATELY follows this FORMULA (after at most a
                // SHRFMLA/ARRAY/TABLE companion record, BIFF8 §2.5.5).
                // Bounded lookahead — an unbounded scan would steal a
                // LATER formula's STRING when this one's is absent.
                val companions = Set(0x04BC, 0x0221, 0x0236) // SHRFMLA/ARRAY/TABLE
                var si = k + 1
                while (si < recs.length && companions.contains(recs(si).typ))
                  si += 1
                if (si < recs.length && recs(si).typ == RecString) {
                  val sr = new SegReader(wb, Seq((recs(si).off, recs(si).len)))
                  cells((row, c)) = sr.xlString()
                }
              case 1 => cells((row, c)) =
                if ((wb(r.off + 8) & 0xFF) != 0) "true" else "false"
              case _ => () // error / blank cached results stay NULL
            }
          } else {
            val d = ByteBuffer.wrap(wb, r.off + 6, 8)
              .order(ByteOrder.LITTLE_ENDIAN).getDouble
            cells((row, c)) = formatNum(d)
          }
        case _ => ()
      }
      k += 1
    }

    require(cells.nonEmpty, s"$path: sheet has no cells")
    val width = cells.keys.map(_._2).max + 1
    val rowIds = cells.keys.map(_._1).toSeq.distinct.sorted
    def dense(row: Int): Seq[String] =
      (0 until width).map(c => cells.getOrElse((row, c), null))
    val header = dense(rowIds.head).zipWithIndex.map {
      case (null, i) => s"_c$i"
      case (h, _)    => h
    }
    (header, rowIds.tail.map(dense))
  }

  /** Read a sheet (first sheet when `sheet` is None) as an all-string
    * DataFrame, header from the first non-empty row — the same output
    * contract as [[Xlsx.readSheet]], so a caller can ingest `.xls` and
    * `.xlsx` catalogs interchangeably. */
  def readSheet(spark: SparkSession, path: String, sheet: Option[String] = None): DataFrame = {
    val (header, data) = parseSheet(path, sheet)
    val schema = StructType(header.map(StructField(_, StringType, nullable = true)))
    spark.createDataFrame(data.map(Row.fromSeq).asJava, schema)
  }
}
