package graft

import graft.io.VdvX10
import graft.queries.SystemShapes
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** VDV .x10 multi-table reader (S9-S11): exact parsed contents, frm;
  * typing, and the q34 query's full output against a hand-computed
  * oracle (q34 is rows-only in CORRECTNESS because its fixture lives
  * outside the sf dir — this spec is its hard signal).
  */
class VdvX10Spec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._
  private def fixture = SystemShapes.vdvFixturePath

  test("tableNames finds both sections") {
    assert(VdvX10.tableNames(spark, fixture).toSet ==
      Set("LINE", "OPERATING_DEPARTMENT"))
  }

  test("LINE parses with frm;-derived types and exact rows") {
    val df = VdvX10.readTable(spark, fixture, "LINE")
    assert(df.schema == StructType(Seq(
      StructField("BASE_VERSION", LongType),
      StructField("LINE_NO", LongType),
      StructField("LINE_ABBR", StringType),
      StructField("OP_DEP_NO", LongType),
      StructField("LINE_DESC", StringType))))
    val rows = df.as[(Long, Long, String, Long, String)].collect().toSet
    assert(rows == Set(
      (1L, 101L, "A1", 11L, "Airport Express"),
      (1L, 102L, "B-2", 12L, "Corniche Loop"),
      (1L, 103L, "C3", 21L, "Al Ain Shuttle"),
      (1L, 104L, "D4", 31L, "Dhafra Link"),
      (1L, 104L, "D4", 31L, "Dhafra Link duplicate"),
      (1L, 105L, "E5", 99L, "Orphan Route")))
  }

  test("quoted char fields are unquoted, missing table raises") {
    val op = VdvX10.readTable(spark, fixture, "OPERATING_DEPARTMENT")
    assert(op.select("OP_DEP_ABBR").as[String].collect().toSet ==
      Set("AD1", "AD2", "ER1", "WR1"))
    intercept[IllegalArgumentException] {
      VdvX10.readTable(spark, fixture, "NO_SUCH_TABLE")
    }
  }

  test("q34 output matches the hand-computed oracle") {
    // LINE deduped on LINE_ABBR keeps the first D4; joins to
    // OPERATING_DEPARTMENT; AD*->Abu Dhabi, ER*->Al Ain, WR*->Al
    // Dhafra; op_dep 99 has no dim row -> null abbr -> Unknown.
    val got = graft.SparkEntry.queries("q34_vdv_x10_source")(spark, SparkTestBase.sf)
      .as[(String, Long, String)].collect().toSeq
    assert(got == Seq(
      ("Abu Dhabi", 2L, "A1,B2"),
      ("Al Ain", 1L, "C3"),
      ("Al Dhafra", 1L, "D4"),
      ("Unknown", 1L, "E5")))
  }
}
