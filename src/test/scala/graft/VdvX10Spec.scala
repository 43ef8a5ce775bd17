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

  test("readFolder merges a multi-file export, unioning split tables") {
    import java.nio.charset.StandardCharsets
    import java.nio.file.{Files, Paths}
    val dir = Files.createTempDirectory("graft_vdv_folder")
    // file 1: the standard two-table fixture
    Files.copy(Paths.get(fixture), dir.resolve("i2261280.x10"))
    // file 2: LINE continued (extra column) + a new DAY_TYPE table
    Files.write(dir.resolve("i2901280.x10"),
      """mod; DD.MM.YYYY; HH:MM:SS; free
        |tbl; LINE
        |atr; BASE_VERSION; LINE_NO; LINE_ABBR; OP_DEP_NO; LINE_DESC; EXTRA
        |frm; num[9.0]; num[9.0]; char[6]; num[9.0]; char[40]; num[9.0]
        |rec; 2; 201; "F6"; 11; "Island Express"; 7
        |end;
        |tbl; DAY_TYPE
        |atr; BASE_VERSION; DAY_TYPE_NO; DAY_TYPE_ABBR
        |frm; num[9.0]; num[9.0]; char[6]
        |rec; 1; 1; "WD"
        |rec; 1; 2; "WE"
        |end;
        |""".stripMargin.getBytes(StandardCharsets.UTF_8))
    // non-.x10 noise must be ignored
    Files.write(dir.resolve("readme.txt"), "not vdv".getBytes(StandardCharsets.UTF_8))
    val tables = VdvX10.readFolder(spark, dir.toString)
    assert(tables.keySet == Set("LINE", "OPERATING_DEPARTMENT", "DAY_TYPE"))
    val line = tables("LINE")
    assert(line.count() == 7) // 6 from file 1 + 1 from file 2
    // allowMissingColumns: file-1 rows carry null EXTRA, file-2 row keeps 7
    assert(line.where($"EXTRA".isNotNull).select("LINE_NO")
      .as[Long].collect().toSeq == Seq(201L))
    assert(tables("DAY_TYPE").count() == 2)
  }

  test("quoted char fields may contain the field separator") {
    import java.nio.charset.StandardCharsets
    import java.nio.file.Files
    val f = Files.createTempFile("graft_vdv_semicolon", ".x10")
    Files.write(f,
      """tbl; LINE
        |atr; LINE_NO; LINE_ABBR; LINE_DESC
        |frm; num[9.0]; char[6]; char[40]
        |rec; 1; "A;1"; "Airport; Express"
        |end;
        |""".stripMargin.getBytes(StandardCharsets.UTF_8))
    val row = VdvX10.readTable(spark, f.toString, "LINE")
      .as[(Long, String, String)].collect().toSeq
    assert(row == Seq((1L, "A;1", "Airport; Express")),
      "';' inside quotes must not shift columns")
  }

  test("readAll unions a table split across sections of ONE file") {
    import java.nio.charset.StandardCharsets
    import java.nio.file.Files
    val f = Files.createTempFile("graft_vdv_multibatch", ".x10")
    // LINE appears twice in the same file (multi-batch export): both
    // batches must survive — a (name -> df) toMap kept only the last
    Files.write(f,
      """mod; DD.MM.YYYY; HH:MM:SS; free
        |tbl; LINE
        |atr; BASE_VERSION; LINE_NO; LINE_ABBR
        |frm; num[9.0]; num[9.0]; char[6]
        |rec; 1; 301; "G7"
        |end;
        |tbl; LINE
        |atr; BASE_VERSION; LINE_NO; LINE_ABBR
        |frm; num[9.0]; num[9.0]; char[6]
        |rec; 1; 302; "H8"
        |rec; 1; 303; "I9"
        |end;
        |""".stripMargin.getBytes(StandardCharsets.UTF_8))
    val tables = VdvX10.readAll(spark, f.toString)
    assert(tables.keySet == Set("LINE"))
    assert(tables("LINE").select("LINE_NO").as[Long].collect().toSet ==
      Set(301L, 302L, 303L))
  }

  test("DataSourceV2 format('vdvx10') reads the same rows as the function API") {
    val viaFormat = spark.read.format("vdvx10").option("table", "LINE")
      .load(fixture)
    val viaApi = VdvX10.readTable(spark, fixture, "LINE")
    assert(viaFormat.schema == viaApi.schema)
    assert(viaFormat.collect().toSet == viaApi.collect().toSet)
    // missing table lists what the file has, like the function API
    val e = intercept[Exception] {
      spark.read.format("vdvx10").option("table", "NOPE").load(fixture).collect()
    }
    assert(e.getMessage.contains("LINE"))
  }

  test("vdvx10 format prunes columns at the scan") {
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    val df = spark.read.format("vdvx10").option("table", "LINE")
      .load(fixture).select($"LINE_ABBR")
    val scans = df.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b.scan.readSchema() }
    assert(scans.nonEmpty, "expected a BatchScanExec")
    assert(scans.head.fieldNames.toSeq == Seq("LINE_ABBR"),
      s"scan must read only the projected column, got ${scans.head}")
    assert(df.as[String].collect().toSet == Set("A1", "B-2", "C3", "D4", "E5"))
  }

  test("pure SQL reaches .x10 data via CREATE TEMPORARY VIEW ... USING vdvx10") {
    spark.sql(
      s"""CREATE OR REPLACE TEMPORARY VIEW vdv_line
         |USING vdvx10 OPTIONS (path '$fixture', `table` 'LINE')""".stripMargin)
    val n = spark.sql(
      "SELECT count(*) FROM vdv_line WHERE OP_DEP_NO = 31").as[Long].head()
    assert(n == 2L)
  }

  test("vdvx10 format reads a folder, merging multi-batch schemas by name") {
    import java.nio.charset.StandardCharsets
    import java.nio.file.{Files, Paths}
    val dir = Files.createTempDirectory("graft_vdv_dsv2_folder")
    Files.copy(Paths.get(fixture), dir.resolve("a.x10"))
    Files.write(dir.resolve("b.x10"),
      """tbl; LINE
        |atr; BASE_VERSION; LINE_NO; LINE_ABBR; OP_DEP_NO; LINE_DESC; EXTRA
        |frm; num[9.0]; num[9.0]; char[6]; num[9.0]; char[40]; num[9.0]
        |rec; 2; 201; "F6"; 11; "Island Express"; 7
        |end;
        |""".stripMargin.getBytes(StandardCharsets.UTF_8))
    val df = spark.read.format("vdvx10").option("table", "LINE")
      .load(dir.toString)
    assert(df.schema.fieldNames.toSeq ==
      Seq("BASE_VERSION", "LINE_NO", "LINE_ABBR", "OP_DEP_NO", "LINE_DESC", "EXTRA"))
    assert(df.count() == 7)
    assert(df.where($"EXTRA".isNotNull).select("LINE_NO")
      .as[Long].collect().toSeq == Seq(201L))
  }

  test("vdvx10 pushes = / IN string predicates into rec; parsing") {
    val fixture = graft.queries.SystemShapes.vdvFixturePath
    // equality, with the filter column PRUNED from the output — the
    // reader evaluates on the raw fields, not the required schema
    val eq = spark.read.format("vdvx10").option("table", "LINE")
      .load(fixture).where($"LINE_ABBR" === "A1").select($"LINE_NO")
    val eqPlan = eq.queryExecution.executedPlan.toString
    assert(eqPlan.contains("PushedFilters: [") &&
      eqPlan.contains("EqualTo(LINE_ABBR,A1)"), eqPlan)
    assert(eq.as[Long].collect().toSeq == Seq(101L))
    // IN
    val in = spark.read.format("vdvx10").option("table", "LINE")
      .load(fixture).where($"LINE_ABBR".isin("A1", "C3")).select($"LINE_NO")
    assert(in.queryExecution.executedPlan.toString.contains("In(LINE_ABBR"),
      in.queryExecution.executedPlan.toString)
    assert(in.as[Long].collect().toSeq.sorted == Seq(101L, 103L))
    // numeric equality is NOT pushed (lenient numeric parsing isn't
    // reproducible on the raw text) — evaluated post-scan, same rows
    val num = spark.read.format("vdvx10").option("table", "LINE")
      .load(fixture).where($"OP_DEP_NO" === 31L)
    assert(!num.queryExecution.executedPlan.toString
      .contains("EqualTo(OP_DEP_NO"))
    assert(num.count() == 2)
    // no-match predicate returns empty, not an error
    assert(spark.read.format("vdvx10").option("table", "LINE")
      .load(fixture).where($"LINE_ABBR" === "ZZ").count() == 0)
  }

  test("pushed predicates compare the UNQUOTED parsed value, incl. separators") {
    // the filter must see the same value the row would carry — a
    // quoted field holding the field separator or spaces is the case
    // where raw-text comparison and parsed-value comparison diverge
    import java.nio.charset.StandardCharsets
    import java.nio.file.Files
    val f = Files.createTempFile("graft_vdv_pushq", ".x10")
    Files.write(f,
      """tbl; LINE
        |atr; LINE_NO; LINE_ABBR; LINE_DESC
        |frm; num[9.0]; char[6]; char[40]
        |rec; 1; "A;1"; "Airport; Express"
        |rec; 2; "B2"; "Corniche Loop"
        |rec; 3; ; "No Abbr"
        |end;
        |""".stripMargin.getBytes(StandardCharsets.UTF_8))
    def rd = spark.read.format("vdvx10").option("table", "LINE").load(f.toString)
    assert(rd.where($"LINE_ABBR" === "A;1").select($"LINE_NO")
      .as[Long].collect().toSeq == Seq(1L))
    assert(rd.where($"LINE_DESC" === "Airport; Express").select($"LINE_NO")
      .as[Long].collect().toSeq == Seq(1L))
    // IS NOT NULL pushes: the empty field is dropped during parsing
    val nn = rd.where($"LINE_ABBR".isNotNull)
    assert(nn.queryExecution.executedPlan.toString
      .contains("IsNotNull(LINE_ABBR)"))
    assert(nn.select($"LINE_NO").as[Long].collect().toSeq.sorted == Seq(1L, 2L))
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
