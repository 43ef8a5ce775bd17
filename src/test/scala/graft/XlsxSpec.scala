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

  test("q58 runs end-to-end over the fixture dim") {
    val out = SparkEntry.queries("q58_xlsx_dim_source")(spark, SparkTestBase.sf)
      .collect()
    assert(out.nonEmpty)
    // inactive Link (WR) filtered; service_no 3 absent from output keys
    assert(!out.map(_.getString(0)).contains("Link"))
  }
}
