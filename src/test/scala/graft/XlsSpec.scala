package graft

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

import graft.io.Xls
import org.scalatest.funsuite.AnyFunSuite

/** Native BIFF8 (.xls) reader: a generated CFB+BIFF fixture covering
  * every cell record type (and the mini-FAT container path — the
  * fixture workbook is under the 4096-byte cutoff), plus the actual
  * reference catalog `docs/ads_revenue.xls`, whose parsed rows must
  * match the q55-q57 schema constants that were previously
  * hand-transcribed from it.
  */
class XlsSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  // ---------- byte builders ----------

  private def le16(v: Int): Array[Byte] = Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
  private def le32(v: Int): Array[Byte] =
    Array(v, v >> 8, v >> 16, v >> 24).map(x => (x & 0xFF).toByte)
  private def rec(typ: Int, payload: Array[Byte]): Array[Byte] =
    le16(typ) ++ le16(payload.length) ++ payload

  /** Minimal BIFF8 workbook: globals (BOF, BOUNDSHEET, SST with a
    * CONTINUE that flips compression mid-string, EOF) + one sheet with
    * LABELSST / LABEL / NUMBER / RK / MULRK / BOOLERR / FORMULA cells. */
  private def buildBiff(): Array[Byte] = {
    // sheet substream first (so the BOUNDSHEET offset is computable)
    val sheet = new ByteArrayOutputStream()
    sheet.write(rec(0x0809, le16(0x0600) ++ le16(0x0010) ++ le32(0) ++ le32(0)))
    def cell(typ: Int, row: Int, col: Int, rest: Array[Byte]): Array[Byte] =
      rec(typ, le16(row) ++ le16(col) ++ le16(0) ++ rest)
    // header row: LABELSST into sst[0], sst[1]
    sheet.write(cell(0x00FD, 0, 0, le32(0)))
    sheet.write(cell(0x00FD, 0, 1, le32(1)))
    sheet.write(rec(0x00FD, le16(0) ++ le16(2) ++ le16(0) ++ le32(2))) // split string
    // row 1: inline LABEL, NUMBER, RK int/100
    val label = "inline".getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    sheet.write(cell(0x0204, 1, 0, le16(label.length) ++ Array(0.toByte) ++ label))
    val num = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN).putDouble(2.5).array()
    sheet.write(cell(0x0203, 1, 1, num))
    sheet.write(cell(0x027E, 1, 2, le32((1234 << 2) | 0x02 | 0x01))) // 12.34
    // row 2: MULRK of two int RKs (7, 8), BOOLERR true + an error cell
    sheet.write(rec(0x00BD, le16(2) ++ le16(0) ++
      (le16(0) ++ le32((7 << 2) | 0x02)) ++ (le16(0) ++ le32((8 << 2) | 0x02)) ++ le16(1)))
    sheet.write(cell(0x0205, 2, 2, Array(1.toByte, 0.toByte)))
    sheet.write(cell(0x0205, 2, 3, Array(0x17.toByte, 1.toByte))) // #REF! stays null
    // row 3: FORMULA with cached number; FORMULA with cached string + STRING
    sheet.write(cell(0x0006, 3, 0,
      ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN).putDouble(9.0).array() ++
        le16(0) ++ le32(0) ++ le16(0)))
    sheet.write(cell(0x0006, 3, 1,
      Array(0, 0, 0, 0, 0, 0).map(_.toByte) ++ Array(0xFF.toByte, 0xFF.toByte) ++
        le16(0) ++ le32(0) ++ le16(0)))
    val fstr = "fx".getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    sheet.write(rec(0x0207, le16(fstr.length) ++ Array(0.toByte) ++ fstr))
    sheet.write(rec(0x000A, Array.empty))
    val sheetBytes = sheet.toByteArray

    // globals — assembled twice: BOUNDSHEET needs its own substream size
    def globals(sheetPos: Int): Array[Byte] = {
      val g = new ByteArrayOutputStream()
      g.write(rec(0x0809, le16(0x0600) ++ le16(0x0005) ++ le32(0) ++ le32(0)))
      val name = "Cat".getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
      g.write(rec(0x0085, le32(sheetPos) ++ le16(0) ++
        Array(name.length.toByte, 0.toByte) ++ name))
      // SST: 3 refs, 3 uniques. s0/s1 compressed; s2 = "abcdé" split
      // across a CONTINUE whose continuation flips to WIDE chars.
      val s0 = "colA".getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
      val s1 = "colB".getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
      val sstBody = le32(3) ++ le32(3) ++
        le16(s0.length) ++ Array(0.toByte) ++ s0 ++
        le16(s1.length) ++ Array(0.toByte) ++ s1 ++
        le16(5) ++ Array(0.toByte) ++
        "abc".getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
      g.write(rec(0x00FC, sstBody))
      g.write(rec(0x003C, Array(1.toByte) ++
        "dé".getBytes(java.nio.charset.StandardCharsets.UTF_16LE)))
      g.write(rec(0x000A, Array.empty))
      g.toByteArray
    }
    val size = globals(0).length
    globals(size) ++ sheetBytes
  }

  /** Wrap a (small) Workbook stream in a v3 CFB container. The stream
    * is under the 4096-byte mini cutoff, so it lives in 64-byte mini
    * sectors — the generated fixture exercises the mini-FAT path the
    * big reference file doesn't. */
  private def buildCfb(workbook: Array[Byte], shift: Int = 9): Array[Byte] = {
    require(workbook.length < 4096, "fixture workbook must stay mini-stream-sized")
    require(shift == 9 || shift == 12, s"CFB shift must be 9 or 12: $shift")
    val sz = 1 << shift
    val entries = sz / 4               // FAT entries per sector
    val dirSlots = sz / 128            // directory entries per sector
    val miniSecs = (workbook.length + 63) / 64
    val miniBytes = miniSecs * 64
    val containerSecs = (miniBytes + sz - 1) / sz
    // sectors: 0 = FAT, 1 = directory, 2 = mini-FAT, 3.. = mini-stream
    // container. MS-CFB: sector n starts at (n+1) << shift — for V4
    // the 512-byte header pads to a full 4096-byte sector.
    val totalSecs = 3 + containerSecs
    def secOff(n: Int): Int = (n + 1) << shift
    val out = ByteBuffer.allocate(secOff(totalSecs)).order(ByteOrder.LITTLE_ENDIAN)
    // header
    out.putLong(0, 0xE11AB1A1E011CFD0L)
    out.putShort(24, 0x003E.toShort)
    out.putShort(26, (if (shift == 9) 3 else 4).toShort)         // version
    out.putShort(28, 0xFFFE.toShort)                             // little-endian
    out.putShort(30, shift.toShort); out.putShort(32, 6.toShort) // sz / 64
    out.putInt(44, 1)            // one FAT sector
    out.putInt(48, 1)            // first directory sector
    out.putInt(56, 4096)         // mini cutoff
    out.putInt(60, 2)            // first mini-FAT sector
    out.putInt(64, 1)            // one mini-FAT sector
    out.putInt(68, 0xFFFFFFFE)   // no DIFAT chain
    out.putInt(72, 0)
    out.putInt(76, 0)            // DIFAT[0] -> FAT at sector 0
    (1 until 109).foreach(i => out.putInt(76 + 4 * i, 0xFFFFFFFF))
    // FAT (sector 0)
    val fat = secOff(0)
    out.putInt(fat + 0, 0xFFFFFFFD)  // sector 0: FAT marker
    out.putInt(fat + 4, 0xFFFFFFFE)  // directory: single-sector chain
    out.putInt(fat + 8, 0xFFFFFFFE)  // mini-FAT: single-sector chain
    (0 until containerSecs).foreach { i =>
      out.putInt(fat + 12 + 4 * i,
        if (i == containerSecs - 1) 0xFFFFFFFE else 3 + i + 1)
    }
    (3 + containerSecs until entries).foreach(i => out.putInt(fat + 4 * i, 0xFFFFFFFF))
    // directory (sector 1): Root Entry + Workbook
    def dirEntry(base: Int, name: String, typ: Int, start: Int, size: Int,
                 child: Int): Unit = {
      val u16n = name.getBytes(java.nio.charset.StandardCharsets.UTF_16LE)
      (0 until u16n.length).foreach(i => out.put(base + i, u16n(i)))
      out.putShort(base + 64, (u16n.length + 2).toShort)
      out.put(base + 66, typ.toByte)
      out.put(base + 67, 1.toByte)
      out.putInt(base + 68, 0xFFFFFFFF); out.putInt(base + 72, 0xFFFFFFFF)
      out.putInt(base + 76, child)
      out.putInt(base + 116, start)
      out.putInt(base + 120, size)
    }
    val dir = secOff(1)
    dirEntry(dir, "Root Entry", 5, 3, miniBytes, child = 1)
    dirEntry(dir + 128, "Workbook", 2, 0, workbook.length, child = 0xFFFFFFFF)
    // remaining directory slots stay zeroed (type 0 = unused)
    // mini-FAT (sector 2)
    val mf = secOff(2)
    (0 until miniSecs).foreach { i =>
      out.putInt(mf + 4 * i, if (i == miniSecs - 1) 0xFFFFFFFE else i + 1)
    }
    (miniSecs until entries).foreach(i => out.putInt(mf + 4 * i, 0xFFFFFFFF))
    // mini-stream container (sectors 3..)
    workbook.indices.foreach(i => out.put(secOff(3) + i, workbook(i)))
    out.array()
  }

  test("V4 compound file (4096-byte sectors) parses identically to V3") {
    // regression: sector offsets are (n+1)<<shift per MS-CFB — the
    // 512+n*512 shortcut coincides with V3 only, and read V4 FAT/
    // directory/streams from the wrong bytes
    val wb = buildBiff()
    val p3 = Files.createTempFile("graft_xls_v3", ".xls")
    val p4 = Files.createTempFile("graft_xls_v4", ".xls")
    Files.write(p3, buildCfb(wb, shift = 9))
    Files.write(p4, buildCfb(wb, shift = 12))
    assert(Xls.sheetNames(p4.toString) == Xls.sheetNames(p3.toString))
    val r3 = Xls.readSheet(spark, p3.toString).collect().map(_.toSeq).toSeq
    val r4 = Xls.readSheet(spark, p4.toString).collect().map(_.toSeq).toSeq
    assert(r4 == r3 && r3.nonEmpty)
  }

  test("generated BIFF8 fixture parses: every cell record type + mini-FAT + SST CONTINUE flip") {
    val p = Files.createTempFile("graft_xls_fixture", ".xls")
    Files.write(p, buildCfb(buildBiff()))
    assert(Xls.sheetNames(p.toString) == Seq("Cat"))
    val df = Xls.readSheet(spark, p.toString)
    assert(df.columns.toSeq == Seq("colA", "colB", "abcdé"))
    val rows = df.collect().map(_.toSeq)
    assert(rows(0) == Seq("inline", "2.5", "12.34"))
    assert(rows(1) == Seq("7", "8", "true")) // the #REF! error cell stays null
    assert(rows(2) == Seq("9", "fx", null))
  }

  test("ads_revenue.xls catalog parses and matches the q55-q57 schema constants") {
    val path = "/root/reference/docs/ads_revenue.xls"
    assume(Files.exists(Paths.get(path)), "reference catalog not present")
    assert(Xls.sheetNames(path).head == "ads_revenue_0821")
    val cat = Xls.readSheet(spark, path, Some("ads_revenue_0821"))
    assert(cat.columns.toSeq == Seq("relname", "comment", "type", "name", "notnull"))
    assert(cat.count() == 75)
    def catalogCols(rel: String): Seq[String] =
      cat.where($"relname" === rel).select($"name").as[String].collect().toSeq
    // the pipelines' output schemas ARE the catalog rows, in order
    val checks = Seq(
      "q55_ads_fare_revenue_service_type" -> "ads_fare_revenue_service_type_mi",
      "q56_ads_revenue_proportion_product_type" -> "ads_revenue_proportion_product_type_mi",
      "q57_ads_revenue_route" -> "ads_revenue_route_mi")
    checks.foreach { case (q, rel) =>
      val got = graft.SparkEntry.queries(q)(spark, SparkTestBase.sf).columns.toSeq
      assert(got == catalogCols(rel),
        s"$q output schema diverges from the parsed catalog for $rel")
      spark.catalog.clearCache()
    }
  }
}
