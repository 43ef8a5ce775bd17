package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import graft.io.Sinks
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

/** Sinks & ingestion lifecycle (S5/S14/S15/S16/P9): executed JDBC
  * staging-swap against embedded Derby, swap atomicity under a failed
  * staging write, CSV append-header-once, NA-token normalization,
  * encoding fallback, schema sidecars, and resume markers.
  */
class SinksSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val url = "jdbc:derby:memory:graftsinks;create=true"

  test("jdbcPublish writes via staging and swaps atomically") {
    val v1 = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    Sinks.jdbcPublish(v1, url, "t_pub", batchSize = 1)
    val r1 = spark.read.jdbc(url, "t_pub", new java.util.Properties)
      .as[(Long, String)].collect().toSet
    assert(r1 == Set((1L, "a"), (2L, "b")))
    // second publish replaces the live table
    val v2 = Seq((3L, "c")).toDF("id", "v")
    Sinks.jdbcPublish(v2, url, "t_pub")
    val r2 = spark.read.jdbc(url, "t_pub", new java.util.Properties)
      .as[(Long, String)].collect().toSet
    assert(r2 == Set((3L, "c")))
    // no staging/old leftovers
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val rs = conn.getMetaData.getTables(null, null, "T_PUB%", null)
      val names = Iterator.continually(rs).takeWhile(_.next()).map(_.getString(3)).toList
      assert(names == List("T_PUB"), s"leftover tables: $names")
    } finally conn.close()
  }

  test("a failed staging write leaves the live table untouched") {
    val v1 = Seq((1L, "keep")).toDF("id", "v")
    Sinks.jdbcPublish(v1, url, "t_atomic")
    val boom = udf((id: Long) => {
      if (id == 2L) throw new RuntimeException("boom"); id
    })
    val bad = Seq(1L, 2L).toDF("id").withColumn("id", boom($"id"))
      .withColumn("v", lit("x"))
    intercept[Exception] { Sinks.jdbcPublish(bad, url, "t_atomic") }
    val r = spark.read.jdbc(url, "t_atomic", new java.util.Properties)
      .as[(Long, String)].collect().toSet
    assert(r == Set((1L, "keep")), "live table must survive a failed staging write")
  }

  test("publishAtomic replaces the target via staging rename, no staging left") {
    val out = Files.createTempDirectory("graft_pub").resolve("out").toString
    Sinks.publishAtomic(Seq((1, "a")).toDF("id", "v"), out)
    assert(spark.read.parquet(out).count() == 1)
    // second publish fully replaces (overwrite semantics, not append)
    Sinks.publishAtomic(Seq((1, "a"), (2, "b")).toDF("id", "v"), out)
    assert(spark.read.parquet(out).as[(Int, String)].collect().toSet ==
      Set((1, "a"), (2, "b")))
    assert(!Files.exists(Paths.get(out + ".__staging")), "staging dir cleaned")
  }

  test("jdbcSwapStatements pins the publish swap sequence") {
    // the documented dialect twin of jdbcPublish's executed swap —
    // the reference's transactional swap (pg_import.R:302-313) with
    // the rename-to-__old safety upgrade (see the scaladoc)
    assert(Sinks.jdbcSwapStatements("ads_x") == Seq(
      "BEGIN",
      "DROP TABLE IF EXISTS ads_x__old",
      "ALTER TABLE IF EXISTS ads_x RENAME TO ads_x__old",
      "ALTER TABLE ads_x__staging RENAME TO ads_x",
      "DROP TABLE IF EXISTS ads_x__old",
      "COMMIT"))
  }

  test("appendCsvHeaderOnce writes the header exactly once across appends") {
    val target = Files.createTempDirectory("graft_csv").resolve("out.csv").toString
    val df = Seq((1, "x"), (2, "y")).toDF("id", "v").orderBy("id")
    Sinks.appendCsvHeaderOnce(df, target)
    Sinks.appendCsvHeaderOnce(df, target)
    val lines = Files.readAllLines(Paths.get(target), StandardCharsets.UTF_8).asScala
    assert(lines.count(_ == "id,v") == 1, s"header must appear once: $lines")
    assert(lines.size == 5, s"1 header + 2x2 rows, got $lines")
  }

  test("normalizeNaTokens nulls the reference's six NA tokens, strings only") {
    val df = Seq(("NA", 1), ("N/A", 2), ("#N/A", 3), ("null", 4), ("ok", 5), ("", 6))
      .toDF("s", "n")
    val out = Sinks.normalizeNaTokens(df).as[(Option[String], Int)].collect().toSet
    assert(out == Set((None, 1), (None, 2), (None, 3), (None, 4), (Some("ok"), 5), (None, 6)))
  }

  test("detectCsvEncoding falls back to Latin-1 on malformed UTF-8") {
    val utf8 = Files.createTempFile("graft_enc", ".csv")
    Files.write(utf8, "a,b\n1,café\n".getBytes(StandardCharsets.UTF_8))
    assert(Sinks.detectCsvEncoding(utf8.toString) == "UTF-8")
    val latin = Files.createTempFile("graft_enc", ".csv")
    Files.write(latin, "a,b\n1,café\n".getBytes(StandardCharsets.ISO_8859_1))
    assert(Sinks.detectCsvEncoding(latin.toString) == "ISO-8859-1")
  }

  test("detectCsvEncoding BOM-sniffs UTF-16 (both orders) and UTF-32") {
    def write(bytes: Array[Byte]): String = {
      val p = Files.createTempFile("graft_enc16", ".csv")
      Files.write(p, bytes); p.toString
    }
    val content = "a,b\n1,café\n"
    assert(Sinks.detectCsvEncoding(write(
      Array(0xFF.toByte, 0xFE.toByte) ++
        content.getBytes(StandardCharsets.UTF_16LE))) == "UTF-16")
    assert(Sinks.detectCsvEncoding(write(
      content.getBytes(StandardCharsets.UTF_16))) == "UTF-16") // BE + BOM
    // UTF-32LE opens FF FE 00 00 — must NOT be taken for UTF-16LE
    assert(Sinks.detectCsvEncoding(write(
      Array[Byte](0xFF.toByte, 0xFE.toByte, 0, 0) ++
        content.getBytes(java.nio.charset.Charset.forName("UTF-32LE")))) == "UTF-32")
    assert(Sinks.detectCsvEncoding(write(
      Array[Byte](0, 0, 0xFE.toByte, 0xFF.toByte) ++
        content.getBytes(java.nio.charset.Charset.forName("UTF-32BE")))) == "UTF-32")
  }

  test("q71 UTF-16 catalog ingest matches the hand-computed result") {
    val got = graft.SparkEntry.queries("q71_csv_utf16_catalog")(
        spark, SparkTestBase.sf)
      .as[(String, Long, Long, String, String)]
      .collect().toSeq
    assert(got == Seq(
      ("ads_fare_revenue_region_mi", 2L, 1L, "fare_aed,old_fare",
        "naïve float (déprécié)"),
      ("ads_passenger_transfer_count_di", 2L, 2L, "journey_num,region_id",
        "Tägliche Umsteige-Zählung|région — clé"),
      ("dim_date", 2L, 1L, "day_name,t_date", "Datums-Dimension")))
  }

  test("q69 Latin-1 ingest matches the hand-computed result") {
    // end-to-end S5+S7+P9+F26: detect ISO-8859-1, decode the accents,
    // parse dd.MM.yyyy timestamps, null all six NA tokens (incl.
    // "#N/A" under BIGINT and "NA" under TIMESTAMP), aggregate
    val got = graft.SparkEntry.queries("q69_csv_encoding_ingest")(
        spark, SparkTestBase.sf)
      .as[(String, Long, Long, Long, Long, Long, String, String)]
      .collect().toSeq
    assert(got == Seq(
      ("AD", 2L, 2L, 120L, 1L, 2L, "2025-03-02 08:00:30",
        "Café Corniche,Über Station"),
      ("ER", 2L, 1L, 125L, 0L, 1L, "2025-03-15 23:59:59",
        "Bahnhof Müller"),
      ("WR", 2L, 1L, 60L, 1L, 1L, "2025-03-07 12:30:00",
        "Plaça Reial")))
  }

  test("readCsvExplicit applies a fixed schema and parses timestamps (S7)") {
    val dir = Files.createTempDirectory("graft_explicit")
    val csv = dir.resolve("t.csv")
    Files.write(csv,
      "id,ts,amount\n1,2025-03-01 10:30:00,2.5\n2,NA,NA\n".getBytes(StandardCharsets.UTF_8))
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "id BIGINT, ts TIMESTAMP, amount DOUBLE")
    val got = Sinks.readCsvExplicit(spark, csv.toString, schema)
      .select($"id", date_format($"ts", "yyyy-MM-dd HH:mm").as("t"), $"amount")
      .as[(Long, Option[String], Option[Double])].collect().toSet
    assert(got == Set((1L, Some("2025-03-01 10:30"), Some(2.5)), (2L, None, None)))
  }

  test("readCsvWithSidecar infers once then reuses the sidecar schema") {
    val dir = Files.createTempDirectory("graft_sidecar")
    val csv = dir.resolve("t.csv")
    Files.write(csv, "id,amount,label\n1,2.5,x\n2,NA,y\n".getBytes(StandardCharsets.UTF_8))
    val sidecar = dir.resolve("t.schema").toString
    val first = Sinks.readCsvWithSidecar(spark, csv.toString, sidecar)
    assert(Files.exists(Paths.get(sidecar)))
    assert(first.schema("amount").dataType.typeName == "double")
    // corrupt-proof reuse: the sidecar, not re-inference, drives pass 2
    val second = Sinks.readCsvWithSidecar(spark, csv.toString, sidecar)
    assert(second.schema == first.schema)
    assert(second.where($"amount".isNull).count() == 1) // NA -> null
  }

  test("preconverted Excel service dim loads and joins with J4 fixups (S12)") {
    // The dim is the CSV produced by scripts/convert_excel_dims.py from
    // the reference's Excel workbook; J4 = left join + post-join manual
    // overwrite of the ADL rows (`...ridership...py:115-126`).
    val dimPath = graft.queries.SystemShapes.serviceDimCsvPath
    val sidecar = Files.createTempDirectory("graft_dim").resolve("svc.schema").toString
    val dim = Sinks.normalizeNaTokens(
      Sinks.readCsvWithSidecar(spark, dimPath, sidecar))
    val facts = Seq(("A1", 10L), ("ADL", 7L), ("ZZ", 1L)).toDF("route", "trips")
    val joined = facts
      .join(broadcast(dim), facts("route") === dim("Route"), "left")
      .drop(dim("Route")) // case-insensitive resolver would see two `route`s
      .withColumn("region_fixed",
        when($"route" === "ADL", "Abu Dhabi").otherwise($"Region"))
      .select($"route", $"region_fixed", $"Type", $"trips")
      .as[(String, Option[String], Option[String], Long)].collect().toSet
    assert(joined == Set(
      ("A1", Some("Abu Dhabi"), Some("Link"), 10L),
      ("ADL", Some("Abu Dhabi"), Some("Express"), 7L), // fixup overwrote NA region
      ("ZZ", None, None, 1L)))
  }

  test("importFolder is resumable via .imported markers") {
    val root = Files.createTempDirectory("graft_folder")
    Files.createDirectories(root.resolve("t1"))
    Files.write(root.resolve("t1/a.csv"), "x\n1\n".getBytes(StandardCharsets.UTF_8))
    Files.write(root.resolve("t1/b.csv"), "x\n2\n".getBytes(StandardCharsets.UTF_8))
    var calls = 0
    def run() = Sinks.importFolder(root.toString, (_, _) => calls += 1)
    val r1 = run()
    assert(r1.map(_._3).toSeq == Seq(false, false) && calls == 2)
    val r2 = run()
    assert(r2.map(_._3).toSeq == Seq(true, true) && calls == 2,
      "second run must skip everything")
  }

  test("partitioned publish prunes partitions at planning time") {
    import graft.core.Tables
    val dir = java.nio.file.Files.createTempDirectory("graft_part_pub").toString
    val ev = Tables.events(spark, SparkTestBase.sf)
      .withColumn("t_date", date_format($"ts", "yyyy-MM-dd"))
      .select($"event_id", $"user_id", $"value", $"t_date")
    Sinks.publishPartitioned(ev, dir, Seq("t_date"))
    val firstDay = ev.agg(min($"t_date")).head().getString(0)
    val read = spark.read.parquet(dir).where($"t_date" === firstDay)
    val plan = read.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.matches("(?s).*PartitionFilters: \\[[^\\]]*t_date[^\\]]*\\].*"),
      s"date filter must reach PartitionFilters, got:\n$plan")
    assert(read.count() == ev.where($"t_date" === firstDay).count())
  }

  test("bucketed tables join and aggregate without exchanges on the bucket key") {
    import graft.core.Tables
    val ev = Tables.events(spark, SparkTestBase.sf)
      .select($"event_id", $"user_id", $"event_type", $"value")
    Sinks.writeBucketed(ev, "ev_bucketed",
      bucketCols = Seq("user_id"), numBuckets = 8, sortCols = Seq("user_id"))
    Sinks.writeBucketed(
      ev.groupBy($"user_id").agg(count(lit(1)).as("n")),
      "users_bucketed", bucketCols = Seq("user_id"), numBuckets = 8)
    // At fixture scale the planner would broadcast (making bucketing
    // moot and "disabled by query planner"); force the shuffle-join
    // path the layout exists for — at 100 TB neither side broadcasts.
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("ev_bucketed")
        .join(spark.table("users_bucketed"), Seq("user_id"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed equi-join must be exchange-free, got:\n$plan")
      // correctness: same rows as the unbucketed join
      assert(joined.count() ==
        ev.join(ev.groupBy($"user_id").agg(count(lit(1)).as("n")), Seq("user_id")).count())
      // groupBy on the bucket key also avoids the shuffle
      val agg = spark.table("ev_bucketed").groupBy($"user_id")
        .agg(sum($"value").as("s"))
      assert(!agg.queryExecution.executedPlan.toString.contains("Exchange"),
        "bucketed groupBy must be exchange-free")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS ev_bucketed")
      spark.sql("DROP TABLE IF EXISTS users_bucketed")
    }
  }
}
