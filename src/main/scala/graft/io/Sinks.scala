package graft.io

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{DataType, StructType}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** Sinks and ingestion lifecycle (SURVEY.md §2.1 S14-S16, §4):
  * atomic publish, schema sidecars, resumable folder ingestion, and the
  * JDBC staging-swap contract.
  *
  * The reference guarantees atomicity by uploading to a temp PostgreSQL
  * table then DROP+RENAME in one transaction
  * (`data_ingestion/pg_import.R:302-313`) and resumability via
  * `.imported` marker files (`data_ingestion/folder_import.R:68-91`).
  * Here the same contracts are restated on a filesystem (staging dir +
  * rename; Spark's `_SUCCESS` + sidecar markers) and as generated swap
  * DDL for JDBC targets.
  */
object Sinks {

  /** S14 — atomic CSV/parquet publish: write to `<out>.__staging`, then
    * rename over the target. Readers never observe partial output; a
    * crashed writer leaves only a staging dir to garbage-collect. */
  def publishAtomic(df: DataFrame, outDir: String, format: String = "parquet",
                    header: Boolean = true): Unit = {
    val spark = df.sparkSession
    val conf = spark.sparkContext.hadoopConfiguration
    val out = new Path(outDir)
    val staging = new Path(outDir + ".__staging")
    val fs = out.getFileSystem(conf)
    if (fs.exists(staging)) fs.delete(staging, true)
    val w = df.write.mode("overwrite")
    (format match {
      case "csv" => w.option("header", header.toString)
      case _     => w
    }).format(format).save(staging.toString)
    if (fs.exists(out)) fs.delete(out, true)
    require(fs.rename(staging, out), s"atomic rename to $outDir failed")
  }

  /** Schema-sidecar persistence (the reference caches inferred CSV
    * schemas in `.schema` files and reuses them for same-table appends
    * — `data_ingestion/pg_import.R:19-51,133-151`). */
  def writeSchemaSidecar(schema: StructType, path: String): Unit =
    Files.write(Paths.get(path), schema.json.getBytes(StandardCharsets.UTF_8))

  def readSchemaSidecar(path: String): Option[StructType] =
    if (Files.exists(Paths.get(path)))
      Some(DataType.fromJson(
        new String(Files.readAllBytes(Paths.get(path)), StandardCharsets.UTF_8))
        .asInstanceOf[StructType])
    else None

  /** S5/S6 — CSV read with schema-sidecar reuse: first contact infers
    * (whole-file, like `readr::type_convert`) and persists the sidecar;
    * subsequent reads of the same table use the cached schema (no
    * inference pass — at scale inference is a full extra scan). */
  def readCsvWithSidecar(spark: SparkSession, csvPath: String,
                         sidecarPath: String): DataFrame = {
    val base = spark.read
      .option("header", "true")
      .option("nullValue", "NA")
      .option("nanValue", "NaN")
      .option("ignoreLeadingWhiteSpace", "true")
      .option("ignoreTrailingWhiteSpace", "true")
    readSchemaSidecar(sidecarPath) match {
      case Some(schema) => base.schema(schema).csv(csvPath)
      case None =>
        val df = base.option("inferSchema", "true").csv(csvPath)
        writeSchemaSidecar(df.schema, sidecarPath)
        df
    }
  }

  /** S15 — JDBC atomic-swap DDL (staging table + transactional rename),
    * the exact statement sequence of the reference's publish step
    * (`data_ingestion/pg_import.R:302-313`). Spark writes to
    * `<table>__staging` via df.write.jdbc(batchsize=...), then the
    * target executes this. Generated (not executed) here — no database
    * ships in the test container. */
  def jdbcSwapStatements(table: String): Seq[String] = {
    val staging = s"${table}__staging"
    Seq(
      "BEGIN",
      s"DROP TABLE IF EXISTS ${table}__old",
      s"ALTER TABLE IF EXISTS $table RENAME TO ${table}__old",
      s"ALTER TABLE $staging RENAME TO $table",
      s"DROP TABLE IF EXISTS ${table}__old",
      "COMMIT")
  }

  /** S16 — resumable folder ingestion: each subfolder is a table; each
    * file is imported once, tracked by a `<file>.imported` marker
    * (idempotent re-runs skip completed work — the reference's resume
    * contract). `importFile` is the per-file action (e.g. a JDBC append
    * or parquet compaction). Returns (table, file, skipped) rows. */
  def importFolder(root: String,
                   importFile: (String, java.io.File) => Unit): Seq[(String, String, Boolean)] = {
    val rootDir = new java.io.File(root)
    val tables = Option(rootDir.listFiles()).getOrElse(Array.empty)
      .filter(_.isDirectory).sortBy(_.getName)
    tables.flatMap { t =>
      val files = Option(t.listFiles()).getOrElse(Array.empty)
        .filter(f => f.isFile && !f.getName.endsWith(".imported")).sortBy(_.getName)
      files.map { f =>
        val marker = new java.io.File(f.getAbsolutePath + ".imported")
        if (marker.exists()) (t.getName, f.getName, true)
        else {
          importFile(t.getName, f)
          Files.write(marker.toPath, Array.emptyByteArray)
          (t.getName, f.getName, false)
        }
      }
    }.toSeq
  }
}
