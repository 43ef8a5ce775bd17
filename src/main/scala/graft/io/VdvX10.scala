package graft.io

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Reader for VDV 452 `.x10` multi-table text files (the reference's
  * transit-schedule input format; three hand-rolled parser variants in
  * the reference — `scripts/ads_passenger_transfer_count_di.py:22-94`
  * (tag variant), `scripts/ads_ridership_passenger_trips_di...py:20-52`
  * (generic `atr;`/`frm;` variant), `ads_passenger_travel_time_di.R:51-72`
  * (fixed-offset variant) — unified here).
  *
  * File grammar (observed): `tbl; NAME` opens a table section; `atr;`
  * lists column names; `frm;` lists formats (`num[p.s]` / `char[n]`);
  * `rec; v1; v2; ...` are rows; `end;` closes the section.
  *
  * Scale design: one distributed pass assigns stable line indexes
  * (`zipWithIndex`); only the rare control lines (`tbl;`/`atr;`/`frm;`/
  * `end;`) are collected to the driver to build the section map; `rec;`
  * rows are then filtered + split entirely on executors. Dimension
  * files are small in practice, but the reader stays out-of-core-safe.
  *
  * S11 note: the reference's R fixed-offset variant (column names at a
  * hard-coded line number, data from line 13, drop the trailing two
  * rows, drop the first column) is a brittle positional re-reading of
  * the SAME grammar — this reader subsumes it behavior-equivalently:
  * the `atr;` line IS the fixed-offset header, the dropped trailing
  * rows are the `end;`/`eof;` control lines (never `rec;`-prefixed, so
  * the filter excludes them), and the dropped first column is the
  * `rec` tag consumed by [[splitFields]].
  */
object VdvX10 {

  private[io] final case class Section(name: String, atrIdx: Long, endIdx: Long,
                                       cols: Seq[String], formats: Seq[String])

  /** Split a control/record line on ';' OUTSIDE double quotes — VDV
    * char[n] fields are quoted and may legitimately contain ';' (a
    * plain split would shift every following column and null out the
    * typed ones). A doubled `""` inside a quoted field is the escaped
    * literal quote (CSV-style, the convention VDV exports follow); an
    * UNTERMINATED quote fails loudly instead of silently merging the
    * rest of the line into one field and nulling the remaining typed
    * columns. The leading tag (`rec`/`atr`/...) is dropped, and
    * TRAILING empty fields are too (Java's `split` semantics — a
    * trailing ';' on an `atr;` line must not mint a phantom column
    * that desynchronizes the cols/formats arity and silently degrades
    * the whole table to strings). Interior empties are kept. */
  private[io] def splitFields(line: String): Seq[String] = {
    val fields = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new java.lang.StringBuilder
    var inQuotes = false
    var i = 0
    while (i < line.length) {
      line.charAt(i) match {
        case '"' if inQuotes && i + 1 < line.length && line.charAt(i + 1) == '"' =>
          cur.append('"'); i += 1 // escaped literal quote, stays inQuotes
        case '"' => inQuotes = !inQuotes; cur.append('"')
        case ';' if !inQuotes => fields += cur.toString; cur.setLength(0)
        case c => cur.append(c)
      }
      i += 1
    }
    require(!inQuotes,
      s"unterminated quote in .x10 line (field would swallow the rest): $line")
    fields += cur.toString
    while (fields.nonEmpty && fields.last.trim.isEmpty) fields.remove(fields.length - 1)
    fields.toSeq.drop(1).map(_.trim.stripPrefix("\"").stripSuffix("\""))
  }

  private[io] def isControl(t: String): Boolean =
    t.startsWith("tbl;") || t.startsWith("atr;") ||
    t.startsWith("frm;") || t.startsWith("end;")

  /** Parse the section layout by collecting only control lines. */
  private def sections(spark: SparkSession, path: String): Seq[Section] = {
    val raw = spark.sparkContext.textFile(path).zipWithIndex()
    val ctl = raw.filter { case (l, _) => isControl(l.trim) }
      .collect().sortBy(_._2).toSeq
    parseControl(ctl)
  }

  /** Same section parse from an in-order (line, index) control list —
    * the driver-side path the DataSourceV2 provider
    * ([[VdvX10Source]]) uses, where schema inference must not launch
    * Spark jobs. */
  private[io] def parseControl(ctl: Seq[(String, Long)]): Seq[Section] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Section]
    var name: Option[String] = None
    var cols: Seq[String] = Nil
    var formats: Seq[String] = Nil
    var start = -1L
    ctl.foreach { case (line, idx) =>
      val t = line.trim
      if (t.startsWith("tbl;")) {
        name = Some(splitFields(t).headOption.getOrElse("").toUpperCase)
        cols = Nil; formats = Nil; start = idx
      } else if (t.startsWith("atr;")) cols = splitFields(t)
      else if (t.startsWith("frm;")) formats = splitFields(t)
      else if (t.startsWith("end;")) {
        name.foreach(n => out += Section(n, start, idx, cols, formats))
        name = None
      }
    }
    out.toSeq
  }

  /** Table names present in the file. */
  def tableNames(spark: SparkSession, path: String): Seq[String] =
    sections(spark, path).map(_.name)

  /** Driver-side section parse via the Hadoop FS API (no Spark jobs) —
    * used by [[VdvX10Source]] schema inference and scan planning. Same
    * UTF-8 line semantics as `sc.textFile`. */
  private[io] def sectionsLocal(conf: org.apache.hadoop.conf.Configuration,
                                path: String): Seq[Section] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val in = p.getFileSystem(conf).open(p)
    try {
      val reader = new java.io.BufferedReader(
        new java.io.InputStreamReader(in, java.nio.charset.StandardCharsets.UTF_8))
      val ctl = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
      var idx = 0L
      var line = reader.readLine()
      while (line != null) {
        if (isControl(line.trim)) ctl += ((line, idx))
        idx += 1
        line = reader.readLine()
      }
      parseControl(ctl.toSeq)
    } finally in.close()
  }

  /** Spark type from a `frm;` format token: `num[p.0]` → LONG,
    * `num[p.s]` (s>0) → DOUBLE, anything else → STRING. */
  private[io] def frmType(fmt: String): DataType = {
    val Num = """num\[(\d+)\.(\d+)\]""".r
    fmt.trim match {
      case Num(_, s) if s.toInt == 0 => LongType
      case Num(_, _)                 => DoubleType
      case _                         => StringType
    }
  }

  /** Read one named table from a `.x10` file. Columns are typed from
    * the `frm;` line when present (reference generic variant), else all
    * strings (tag variant behavior — the caller casts). */
  def readTable(spark: SparkSession, path: String, tableName: String): DataFrame = {
    val secs = sections(spark, path)
    val sec = secs.find(_.name == tableName.toUpperCase)
      .getOrElse(throw new IllegalArgumentException(
        s"table $tableName not in $path (has: ${secs.map(_.name).mkString(",")})"))
    readSection(spark, path, sec)
  }

  private def readSection(spark: SparkSession, path: String, sec: Section): DataFrame = {
    require(sec.cols.nonEmpty, s"table ${sec.name} has no atr; header")

    val types: Seq[DataType] =
      if (sec.formats.size == sec.cols.size) sec.formats.map(frmType)
      else Seq.fill(sec.cols.size)(StringType)
    val schema = StructType(sec.cols.zip(types).map { case (c, t) =>
      StructField(c, t, nullable = true) })

    val nCols = sec.cols.size
    val lo = sec.atrIdx; val hi = sec.endIdx
    val rows = spark.sparkContext.textFile(path).zipWithIndex()
      .filter { case (l, i) => i > lo && i < hi && l.trim.startsWith("rec;") }
      .map { case (l, _) =>
        val fs = splitFields(l.trim).padTo(nCols, "").take(nCols)
        Row.fromSeq(fs.zip(types).map { case (v, t) =>
          if (v.isEmpty) null
          else t match {
            case LongType   => try java.lang.Long.valueOf(v.trim) catch { case _: Exception => null }
            case DoubleType => try java.lang.Double.valueOf(v.trim) catch { case _: Exception => null }
            case _          => v
          }
        })
      }
    spark.createDataFrame(rows, schema)
  }

  /** All tables of the file as a map (dimension-load convenience,
    * mirroring the reference loading 11 VDV tables at once —
    * `ads_passenger_travel_time_di.R:77-91`). The control-line layout
    * is parsed ONCE and shared across every table — per-table
    * `readTable` calls would re-scan the file's control lines K times
    * for a K-table file (K+1 jobs of identical I/O, multiplied per
    * file by readFolder). A table name appearing in several sections of
    * ONE file (multi-batch export) is unioned in file order — `toMap`
    * on (name, df) pairs would silently keep only the last batch. */
  def readAll(spark: SparkSession, path: String): Map[String, DataFrame] =
    sections(spark, path).groupBy(_.name).map { case (name, secs) =>
      name -> secs.map(readSection(spark, path, _))
        .reduce(_.unionByName(_, allowMissingColumns = true))
    }

  /** Whole-export load: every `.x10` file in a directory, merged into
    * one table→DataFrame map — the reference's folder pattern (one file
    * per table, `load_vdv_table(folder, "i2531280.x10")` × 11 at
    * `ads_fare_revenue_region_mi.R:81-103`). A table split across
    * files (multi-batch VDV exports) is unioned by column name; files
    * are listed via the Hadoop FS API so the path may live on any
    * supported filesystem, not just local disk. */
  def readFolder(spark: SparkSession, dir: String): Map[String, DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(p).toSeq
      .filter(s => s.isFile && s.getPath.getName.toLowerCase.endsWith(".x10"))
      .map(_.getPath.toString)
      .sorted // deterministic merge order
    files.flatMap(f => readAll(spark, f).toSeq)
      .groupBy(_._1)
      .map { case (name, dfs) =>
        name -> dfs.map(_._2).reduce(_.unionByName(_, allowMissingColumns = true))
      }
  }
}
