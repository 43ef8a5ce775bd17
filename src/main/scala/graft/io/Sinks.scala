package graft.io

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, when}
import org.apache.spark.sql.types.{DataType, StringType, StructType}
import java.nio.charset.{CharacterCodingException, StandardCharsets}
import java.nio.file.{Files, Paths, StandardOpenOption}
import java.sql.DriverManager
import java.util.Properties
import scala.jdk.CollectionConverters._

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
    * swap via the rename ladder of the reference's DDL sequence
    * (live→`__old`, staging→live, drop `__old` —
    * `data_ingestion/pg_import.R:302-313`). Readers never observe
    * partial output, and NO step deletes the only copy of the previous
    * version: a crash between the two renames leaves the old data
    * intact under `<out>.__old` (a delete-then-rename swap would have a
    * window where the previous publish is simply gone). Filesystem
    * renames aren't one transaction, so the live path can be briefly
    * absent mid-swap — the recoverability contract is what this
    * restates; serving without any gap needs a versioned-dir + symlink
    * or catalog pointer on top. */
  def publishAtomic(df: DataFrame, outDir: String, format: String = "parquet",
                    header: Boolean = true): Unit = {
    val spark = df.sparkSession
    val conf = spark.sparkContext.hadoopConfiguration
    val out = new Path(outDir)
    val staging = new Path(outDir + ".__staging")
    val old = new Path(outDir + ".__old")
    val fs = out.getFileSystem(conf)
    if (fs.exists(staging)) fs.delete(staging, true)
    val w = df.write.mode("overwrite")
    (format match {
      case "csv" => w.option("header", header.toString)
      case _     => w
    }).format(format).save(staging.toString)
    if (fs.exists(old)) fs.delete(old, true)
    if (fs.exists(out))
      require(fs.rename(out, old), s"backup rename of $outDir failed")
    require(fs.rename(staging, out), s"atomic rename to $outDir failed")
    if (fs.exists(old)) fs.delete(old, true)
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

  /** S15 — JDBC atomic-swap DDL (staging table + transactional rename)
    * matching the reference's publish step
    * (`data_ingestion/pg_import.R:302-313`), with one deliberate
    * upgrade: the reference DROPs the live table inside the transaction
    * before renaming staging over it (safe only where DDL is fully
    * transactional, as in PostgreSQL); this sequence renames live →
    * `__old` first, so the previous version stays recoverable on any
    * engine even if the swap dies mid-way. [[jdbcPublish]] executes the
    * same sequence dialect-aware. */
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

  /** Dialect hook for [[jdbcPublish]]: SQL renaming `from` to `to`.
    * Derby (the embedded DB SinksSpec runs against) uses RENAME TABLE;
    * PostgreSQL — the reference's target — ALTER TABLE RENAME. */
  def renameSql(url: String)(from: String, to: String): String =
    if (url.startsWith("jdbc:derby")) s"RENAME TABLE $from TO $to"
    else s"ALTER TABLE $from RENAME TO $to"

  /** S15 — executable JDBC publish: chunked `df.write.jdbc` into
    * `<table>__staging` (batchsize = the reference's upload_chunk_size;
    * task retries replace its 3-attempt loop), then the staging→live
    * swap inside one transaction on the target. A failed staging write
    * never touches the live table — readers see the old version until
    * the rename commits (`data_ingestion/pg_import.R:239-313`). */
  def jdbcPublish(df: DataFrame, url: String, table: String,
                  batchSize: Int = 50000,
                  props: Properties = new Properties): Unit = {
    val staging = s"${table}__staging"
    df.write.mode("overwrite")
      .option("batchsize", batchSize.toString)
      .jdbc(url, staging, props)
    val conn = DriverManager.getConnection(url, props)
    try {
      conn.setAutoCommit(false)
      // identifier case folding is dialect-specific (Derby/Oracle store
      // unquoted names upper, PostgreSQL lower) — probe all three.
      // getTables takes a LIKE pattern: the '_' in every staging/old
      // name is a single-char wildcard that would match unrelated
      // tables (exists("ads_x__old") matching "ads1x2old"), so escape
      // with the driver's search-string escape.
      def exists(t: String): Boolean = {
        val esc = conn.getMetaData.getSearchStringEscape
        def lit(name: String) =
          name.replace(esc, esc + esc)
            .replace("_", esc + "_").replace("%", esc + "%")
        Seq(t, t.toUpperCase, t.toLowerCase).distinct.exists { name =>
          val rs = conn.getMetaData.getTables(null, null, lit(name), null)
          try rs.next() finally rs.close()
        }
      }
      val rename = renameSql(url) _
      val st = conn.createStatement()
      try {
        val old = s"${table}__old"
        if (exists(old)) st.executeUpdate(s"DROP TABLE $old")
        if (exists(table)) st.executeUpdate(rename(table, old))
        st.executeUpdate(rename(staging, table))
        conn.commit()
        if (exists(old)) st.executeUpdate(s"DROP TABLE $old")
        // metadata lookups open transactions of their own (Derby
        // refuses to close a connection mid-transaction) — commit
        // unconditionally before closing.
        conn.commit()
      } finally st.close()
    } finally {
      try conn.rollback() catch { case _: Exception => () }
      conn.close()
    }
  }

  /** S14 — CSV append with header-once: the reference appends month
    * slices to one growing CSV, writing the header only when the file
    * does not exist yet (`scripts/ads_passenger_travel_distance_di
    * .py:330`, pandas `mode='a', header=not exists`). Spark writes the
    * partition files; the driver streams them onto the target (no
    * collect — bytes are copied, not parsed). Single-file output is the
    * reference's own contract here, not a scale path. */
  def appendCsvHeaderOnce(df: DataFrame, targetFile: String): Unit = {
    val tmp = Files.createTempDirectory("graft_csv_append")
    try {
      df.coalesce(1).write.mode("overwrite").option("header", "true")
        .csv(tmp.toString)
      val listing = Files.list(tmp)
      val part =
        try listing.iterator.asScala.find(_.toString.endsWith(".csv"))
          .getOrElse(throw new IllegalStateException(s"no csv part in $tmp"))
        finally listing.close()
      val target = Paths.get(targetFile)
      if (!Files.exists(target)) {
        Files.createDirectories(target.toAbsolutePath.getParent)
        Files.copy(part, target)
      } else {
        // stream past the header line, then buffered byte copy — the
        // slice never materializes in driver memory (readAllLines on a
        // multi-GB slice would hold every line as a heap String)
        val in = Files.newInputStream(part)
        try {
          var b = in.read()
          while (b != -1 && b != '\n') b = in.read()
          val out = Files.newOutputStream(target, StandardOpenOption.APPEND)
          try {
            val buf = new Array[Byte](1 << 16)
            var n = in.read(buf)
            while (n != -1) { out.write(buf, 0, n); n = in.read(buf) }
          } finally out.close()
        } finally in.close()
      }
    } finally {
      // each call writes a full copy of the slice to tmp — delete it
      val walk = Files.walk(tmp)
      try walk.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(p => Files.deleteIfExists(p))
      finally walk.close()
    }
  }

  /** S7 — CSV scan with explicit dtypes + timestamp parsing (the
    * analytics scripts' `pd.read_csv(usecols, dtype, parse_dates)`,
    * `scripts/ads_passenger_travel_info_mi.py:29-45`): a caller-fixed
    * schema (no inference pass — at scale inference is an extra full
    * scan), reference NA tokens, and an explicit timestamp format. */
  def readCsvExplicit(spark: SparkSession, csvPath: String,
                      schema: StructType,
                      timestampFormat: String = "yyyy-MM-dd HH:mm:ss",
                      encoding: String = "UTF-8",
                      multiLine: Boolean = false): DataFrame =
    spark.read
      .option("header", "true")
      .option("nullValue", "NA")
      .option("encoding", encoding)
      .option("timestampFormat", timestampFormat)
      .option("ignoreLeadingWhiteSpace", "true")
      .option("ignoreTrailingWhiteSpace", "true")
      // UTF-16/32 inputs FORCE whole-file decode through the charset
      // (byte-0x0A line splitting lands mid-code-unit in a multi-byte
      // encoding — silent mojibake, not an error), regardless of what
      // the caller passed; catalog-sized files only — a multiLine file
      // is one split, so huge facts should be transcoded to UTF-8
      // upstream instead
      .option("multiLine",
        (multiLine || encoding.toUpperCase(java.util.Locale.ROOT)
          .startsWith("UTF-16") ||
         encoding.toUpperCase(java.util.Locale.ROOT)
          .startsWith("UTF-32")).toString)
      .schema(schema)
      .csv(csvPath)

  /** P9 — NA-token normalization: the reference's CSV ingestion treats
    * six tokens as NULL (`na = c("","NA","NULL","null","N/A","#N/A")`,
    * `data_ingestion/pg_import.R:83`); Spark's csv reader takes only
    * one `nullValue`, so the remaining tokens are normalized post-read
    * on every string column (codegen'd `when` chain, no UDF). */
  val referenceNaTokens: Seq[String] =
    Seq("", "NA", "NULL", "null", "N/A", "#N/A")

  def normalizeNaTokens(df: DataFrame,
                        tokens: Seq[String] = referenceNaTokens): DataFrame =
    df.schema.fields.filter(_.dataType == StringType).foldLeft(df) { (d, f) =>
      d.withColumn(f.name,
        when(col(f.name).isin(tokens.map(x => x: Any): _*), null)
          .otherwise(col(f.name)))
    }

  /** S5/F26 — encoding detection ladder: BOM-sniff UTF-32/UTF-16 first
    * (the reference's ads catalog `docs/ads_all_20250804.csv` is
    * UTF-16LE with BOM), then strict-decode a head sample as UTF-8; on
    * malformed bytes fall back to ISO-8859-1 (the reference's fread
    * UTF-8 → Latin-1 ladder, `data_ingestion/pg_import.R:53-84`).
    * Returns the charset name to pass as the csv reader's `encoding`
    * option. The UTF-16/32 rungs return the endianness-generic charset
    * ("UTF-16"/"UTF-32"): Java's decoder then consumes the BOM itself
    * and picks the byte order, so the first header cell doesn't grow a
    * U+FEFF prefix the way an explicit -LE/-BE charset would leave it.
    * NOTE for readers: pair a UTF-16/32 result with `multiLine=true` —
    * Hadoop's default line splitter cuts on the single byte 0x0A,
    * which lands mid-code-unit in 2/4-byte encodings. */
  def detectCsvEncoding(path: String, sampleBytes: Int = 1 << 20): String = {
    val f = Paths.get(path)
    val fileSize = Files.size(f)
    val size = math.min(fileSize, sampleBytes.toLong).toInt
    val in = Files.newInputStream(f)
    val buf = try in.readNBytes(size) finally in.close()
    val truncated = fileSize > size
    def b(i: Int): Int = buf(i) & 0xFF
    // UTF-32 BOMs first: FF FE 00 00 would otherwise false-match the
    // UTF-16LE sniff (a UTF-16LE file can't open with NUL NUL — that
    // would be an empty code unit)
    if (buf.length >= 4 && b(0) == 0xFF && b(1) == 0xFE && b(2) == 0 && b(3) == 0)
      return "UTF-32"
    if (buf.length >= 4 && b(0) == 0 && b(1) == 0 && b(2) == 0xFE && b(3) == 0xFF)
      return "UTF-32"
    if (buf.length >= 2 && ((b(0) == 0xFF && b(1) == 0xFE) ||
        (b(0) == 0xFE && b(1) == 0xFF)))
      return "UTF-16"
    val decoder = StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
    val bb = java.nio.ByteBuffer.wrap(buf)
    val cb = java.nio.CharBuffer.allocate(size + 1)
    // endOfInput=false when the sample is a prefix: a multi-byte
    // sequence split at the sample boundary is UNDERFLOW (fine), not
    // malformed — otherwise any >1 MB UTF-8 file whose boundary lands
    // mid-character would be misclassified as Latin-1.
    val res = decoder.decode(bb, cb, !truncated)
    if (res.isMalformed || res.isUnmappable) "ISO-8859-1" else "UTF-8"
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

  /** Date-partitioned publish — the pruning layout for ads tables
    * queried by date slice (every EP2 reader filters `t_date`;
    * `scripts/ads_route_passenger_trips_di...py:85-90` reads
    * quarter-month timestamp ranges). `partitionBy` writes one
    * directory per key value, so a reader's date filter prunes whole
    * directories at planning time (PartitionFilters in the scan,
    * asserted in SinksSpec) — at 100 TB the difference between reading
    * a day and reading a year. */
  def publishPartitioned(df: DataFrame, outDir: String,
                         partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite")
      .partitionBy(partitionCols: _*)
      .parquet(outDir)

  /** Bucketed-table publish — the co-located-join layout for fact
    * tables that are repeatedly joined or aggregated on the same key
    * (SURVEY.md §4; at 100 TB the dominant recurring cost of the ads
    * pipelines is re-shuffling the AFC fact table on the journey/user
    * key — bucketing pays that shuffle ONCE at write).
    *
    * Spark's bucketing contract: `bucketBy(n, key)` + `sortBy` persists
    * hash-partitioned, sorted files with bucket metadata in the
    * catalog; a subsequent equi-join or groupBy on the bucket key reads
    * co-located data and plans NO Exchange on the bucketed side(s)
    * (asserted in SinksSpec). Requires `saveAsTable` (bucket metadata
    * lives in the metastore, not the parquet footers).
    */
  def writeBucketed(df: DataFrame, table: String, bucketCols: Seq[String],
                    numBuckets: Int, sortCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
    val sorted =
      if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w
    sorted.format("parquet").saveAsTable(table)
  }
}
