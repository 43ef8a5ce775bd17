package graft

import graft.io.Xlsx
import org.scalatest.funsuite.AnyFunSuite

/** Native xlsx reader (S12): cell-reference arithmetic, every cell form
  * (shared string, inline string, number, boolean, sparse/missing),
  * sheet selection, and the q58 end-to-end flow. The DuckDB oracle for
  * q58 covers value parity; this spec pins the parsed cells directly.
  */
class XlsxSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private lazy val path = graft.queries.SystemShapes.xlsxFixturePath

  test("colIndex: A=0, Z=25, AA=26, BC=54, with row digits ignored") {
    assert(Xlsx.colIndex("A1") == 0)
    assert(Xlsx.colIndex("Z9") == 25)
    assert(Xlsx.colIndex("AA12") == 26)
    assert(Xlsx.colIndex("BC3") == 54)
  }

  test("readSheet parses header + all cell forms, sparse cell is NULL") {
    val df = Xlsx.readSheet(spark, path)
    assert(df.columns.toSeq ==
      Seq("SERVICE_TYPE_NO", "SERVICE_TYPE", "REGION_PREFIX", "ACTIVE"))
    val rows = df.as[(String, String, String, String)].collect().toSeq
    assert(rows == Seq(
      ("1", "Local", "AD", "true"),      // number + shared + inline + bool
      ("2", "Regional", "ER", "true"),
      ("3", "Link", "WR", "false"),      // boolean 0 → "false"
      ("4", "Express", "AD", "true"),    // inline-only row
      ("5", null, "AD", "true")))        // sparse: missing cell → NULL
  }

  test("sheetNames lists sheets; missing sheet name raises") {
    assert(Xlsx.sheetNames(path) == Seq("service_types"))
    assert(Xlsx.readSheet(spark, path, Some("service_types")).count() == 5)
    val e = intercept[IllegalArgumentException] {
      Xlsx.readSheet(spark, path, Some("nope"))
    }
    assert(e.getMessage.contains("no sheet named"))
  }

  test("rich-text runs concatenate; phonetic rPh readings are excluded") {
    // the shape East-Asian Excel/LibreOffice locales emit: shared
    // strings split into <r> runs with trailing <rPh> phonetic readings
    // and xml:space-preserved whitespace; inline strings likewise
    import java.nio.charset.StandardCharsets.UTF_8
    val ns = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    val workbook =
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<workbook xmlns="$ns" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
         |<sheets><sheet name="s1" sheetId="1" r:id="rId1"/></sheets></workbook>""".stripMargin
    val rels =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
        |</Relationships>""".stripMargin
    val sst =
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<sst xmlns="$ns" count="2" uniqueCount="2">
         |<si><r><t>Tokyo HQ</t></r><rPh sb="0" eb="2"><t>toukyou</t></rPh><phoneticPr fontId="1" type="noConversion"/></si>
         |<si><r><t xml:space="preserve">multi </t></r><r><t xml:space="preserve">run </t></r><r><t>cell</t></r></si>
         |</sst>""".stripMargin
    val sheet =
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<worksheet xmlns="$ns"><sheetData>
         |<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c>
         |<c r="C1" t="inlineStr"><is><r><t>in</t></r><r><t>line</t></r><rPh sb="0" eb="1"><t>nope</t></rPh></is></c></row>
         |<row r="2"><c r="A2" t="inlineStr"><is><t>x</t></is></c><c r="B2"><v>7</v></c>
         |<c r="C2" t="s"><v>0</v></c></row>
         |</sheetData></worksheet>""".stripMargin
    val bos = new java.io.ByteArrayOutputStream()
    val zip = new java.util.zip.ZipOutputStream(bos)
    Seq("xl/workbook.xml" -> workbook, "xl/_rels/workbook.xml.rels" -> rels,
        "xl/sharedStrings.xml" -> sst, "xl/worksheets/sheet1.xml" -> sheet)
      .foreach { case (n, c) =>
        zip.putNextEntry(new java.util.zip.ZipEntry(n))
        zip.write(c.getBytes(UTF_8)); zip.closeEntry()
      }
    zip.close()
    val f = java.nio.file.Files.createTempFile("graft_xlsx_phonetic", ".xlsx")
    java.nio.file.Files.write(f, bos.toByteArray)
    val df = Xlsx.readSheet(spark, f.toString)
    // headers: phonetic reading dropped, runs joined, whitespace kept
    assert(df.columns.toSeq == Seq("Tokyo HQ", "multi run cell", "inline"))
    val row = df.as[(String, String, String)].collect().toSeq
    assert(row == Seq(("x", "7", "Tokyo HQ")))
  }

  test("q58 runs end-to-end over the fixture dim") {
    val out = SparkEntry.queries("q58_xlsx_dim_source")(spark, SparkTestBase.sf)
      .collect()
    assert(out.nonEmpty)
    // inactive Link (WR) filtered; service_no 3 absent from output keys
    assert(!out.map(_.getString(0)).contains("Link"))
  }
}
