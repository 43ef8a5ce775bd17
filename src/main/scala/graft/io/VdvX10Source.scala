package graft.io

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, In, IsNotNull}
import org.apache.spark.sql.types.{DataType, DoubleType, LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** SURVEY §4's one justified custom source (the reference's three
  * hand-rolled `.x10` parsers, `scripts/ads_passenger_transfer_count_di
  * .py:22-94` et al.), packaged as a DataSourceV2 `TableProvider` so
  * the format is reachable from the standard read path and from pure
  * SQL — not only through the [[VdvX10]] function API:
  *
  *   spark.read.format("vdvx10").option("table", "LINE").load(path)
  *   CREATE TEMPORARY VIEW line USING vdvx10
  *     OPTIONS (path '/exports', `table` 'LINE')
  *
  * `path` may be one `.x10` file or a folder (every `*.x10` inside,
  * sections unioned in sorted file order — [[VdvX10.readFolder]]
  * semantics). Schema comes from the section's `atr;`/`frm;` lines
  * ([[VdvX10.frmType]]); multi-batch sections of one table merge by
  * column name, and a column typed differently across batches degrades
  * to STRING rather than silently casting.
  *
  * Scan design: one `InputPartition` per section — a section is read
  * sequentially (its `rec;` rows are located by line index), so it is
  * the natural split unit; a 40-table folder export still fans out 40
  * ways, and a single dimension table is one task, which is the right
  * shape for dim-sized VDV files. Column pruning is pushed down
  * (`SupportsPushDownRequiredColumns`): the reader materializes only
  * the requested columns. Predicates push down too
  * (`SupportsPushDownFilters`): `=` / `IN` / `IS NOT NULL` on STRING
  * columns are evaluated against the raw field during `rec;` parsing —
  * a `WHERE LINE_ABBR = 'A1'` over a big export never materializes the
  * non-matching rows (they are dropped before `InternalRow`
  * construction), and the comparison is exact because it runs on the
  * same parsed string value the row would have carried (quote-aware
  * split, empty → NULL → no match), so Spark is told the filter is
  * fully handled and plans no re-check. Control lines are parsed on
  * the driver with plain Hadoop FS I/O ([[VdvX10.sectionsLocal]]) —
  * schema inference launches no Spark jobs.
  */
class VdvX10Source extends TableProvider with DataSourceRegister {

  override def shortName(): String = "vdvx10"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    VdvX10Source.schemaFor(VdvX10Source.matchingSections(options))

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table =
    new VdvX10Table(schema, new CaseInsensitiveStringMap(properties))
}

private[io] object VdvX10Source {

  final case class SectionAt(path: String, sec: VdvX10.Section)

  private def hadoopConf: Configuration =
    SparkSession.active.sessionState.newHadoopConf()

  /** `path` option resolved to the `.x10` file list (folder → every
    * `*.x10` inside, sorted for a deterministic merge order). */
  private def files(conf: Configuration, path: String): Seq[String] = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    if (fs.getFileStatus(p).isDirectory)
      fs.listStatus(p).toSeq
        .filter(s => s.isFile && s.getPath.getName.toLowerCase.endsWith(".x10"))
        .map(_.getPath.toString).sorted
    else Seq(p.toString)
  }

  /** Every section of the requested table across the resolved files,
    * in (file, section) order. */
  def matchingSections(options: CaseInsensitiveStringMap): Seq[SectionAt] = {
    val path = Option(options.get("path")).getOrElse(throw new IllegalArgumentException(
      "vdvx10: a path is required — load(path) or OPTIONS (path '…')"))
    val table = Option(options.get("table")).getOrElse(throw new IllegalArgumentException(
      "vdvx10: option 'table' is required (a .x10 file holds many tables)")).toUpperCase
    val conf = hadoopConf
    val all = files(conf, path).flatMap(f =>
      VdvX10.sectionsLocal(conf, f).map(SectionAt(f, _)))
    val hit = all.filter(_.sec.name == table)
    if (hit.isEmpty) throw new IllegalArgumentException(
      s"vdvx10: table $table not in $path " +
      s"(has: ${all.map(_.sec.name).distinct.sorted.mkString(", ")})")
    hit
  }

  private def sectionSchema(sec: VdvX10.Section): StructType = {
    require(sec.cols.nonEmpty, s"table ${sec.name} has no atr; header")
    val types: Seq[DataType] =
      if (sec.formats.size == sec.cols.size) sec.formats.map(VdvX10.frmType)
      else Seq.fill(sec.cols.size)(StringType)
    StructType(sec.cols.zip(types).map { case (c, t) =>
      StructField(c, t, nullable = true) })
  }

  /** Merge multi-batch section schemas by name: later sections may add
    * columns; a type conflict degrades that column to STRING. */
  def schemaFor(secs: Seq[SectionAt]): StructType =
    secs.map(s => sectionSchema(s.sec)).reduce { (a, b) =>
      val merged = scala.collection.mutable.LinkedHashMap.empty[String, DataType]
      a.fields.foreach(f => merged(f.name) = f.dataType)
      b.fields.foreach { f =>
        merged.get(f.name) match {
          case None                        => merged(f.name) = f.dataType
          case Some(t) if t != f.dataType  => merged(f.name) = StringType
          case _                           => ()
        }
      }
      StructType(merged.map { case (n, t) =>
        StructField(n, t, nullable = true) }.toSeq)
    }
}

private[io] class VdvX10Table(tableSchema: StructType,
                              options: CaseInsensitiveStringMap)
  extends Table with SupportsRead {

  override def name(): String =
    s"vdvx10:${options.get("path")}#${options.get("table")}"

  override def schema(): StructType = tableSchema

  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(caseInsensitiveOptions: CaseInsensitiveStringMap): ScanBuilder =
    new VdvX10ScanBuilder(tableSchema, options)
}

private[io] class VdvX10ScanBuilder(full: StructType,
                                    options: CaseInsensitiveStringMap)
  extends ScanBuilder with SupportsPushDownRequiredColumns
  with SupportsPushDownFilters {
  private var required: StructType = full
  private var pushed: Array[Filter] = Array.empty
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** A filter is accepted iff the reader can evaluate it EXACTLY on
    * the raw parsed field: `=` / `IN` with string values and
    * `IS NOT NULL`, on a column the section declares as STRING (the
    * row would carry the identical string, so raw-field equality ==
    * row equality; numeric columns go through lenient parsing whose
    * null-on-garbage semantics a raw comparison can't reproduce).
    * Accepted filters are fully handled — not returned for re-check. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    def isStringCol(name: String): Boolean =
      full.fields.exists(f => f.name == name && f.dataType == StringType)
    val (ok, rest) = filters.partition {
      case EqualTo(c, v: String) => isStringCol(c) && (v ne null)
      case In(c, vs)             => isStringCol(c) && vs.forall(_.isInstanceOf[String])
      case IsNotNull(c)          => isStringCol(c)
      case _                     => false
    }
    pushed = ok
    rest
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = new VdvX10Scan(required, options, pushed)
}

private[io] class VdvX10Scan(required: StructType,
                             options: CaseInsensitiveStringMap,
                             pushed: Array[Filter])
  extends Scan with Batch {

  override def readSchema(): StructType = required
  override def description(): String =
    s"vdvx10 ${options.get("path")}#${options.get("table")} " +
    s"[${required.fieldNames.mkString(", ")}], " +
    s"PushedFilters: [${pushed.mkString(", ")}]"
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] =
    VdvX10Source.matchingSections(options).map { sa =>
      VdvX10Partition(sa.path, sa.sec.atrIdx, sa.sec.endIdx,
        sa.sec.cols.toArray, pushed): InputPartition
    }.toArray

  override def createReaderFactory(): PartitionReaderFactory = {
    // executors rebuild the Configuration from the serialized entries —
    // SerializableConfiguration is private[spark], and the entry list
    // of a dim read is small enough to ride the task closure
    val entries = SparkSession.active.sessionState.newHadoopConf()
      .iterator().asScala.map(e => (e.getKey, e.getValue)).toArray
    new VdvX10ReaderFactory(required, entries)
  }
}

private[io] final case class VdvX10Partition(path: String, atrIdx: Long,
                                             endIdx: Long, cols: Array[String],
                                             pushed: Array[Filter])
  extends InputPartition

private[io] class VdvX10ReaderFactory(required: StructType,
                                      confEntries: Array[(String, String)])
  extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new VdvX10PartitionReader(partition.asInstanceOf[VdvX10Partition],
      required, confEntries)
}

/** Streams the section's line range and parses `rec;` rows straight to
  * `InternalRow`s of the (possibly pruned) required schema — same
  * field semantics as [[VdvX10.readTable]]: quote-aware split, empty →
  * NULL, unparsable numerics → NULL, missing trailing columns padded. */
private[io] class VdvX10PartitionReader(p: VdvX10Partition,
                                        required: StructType,
                                        confEntries: Array[(String, String)])
  extends PartitionReader[InternalRow] {

  private val colIdx: Array[Int] = required.fields.map(f => p.cols.indexOf(f.name))
  // pushed predicates compiled to (field index, test) pairs; evaluated
  // on the raw split fields BEFORE InternalRow construction, so
  // filtered-out rows are never materialized. A filter column missing
  // from this section's batch reads as "" → NULL → no match (same
  // value the padded row column would carry).
  private val tests: Array[(Int, String => Boolean)] = p.pushed.map {
    case EqualTo(c, v: String) => (p.cols.indexOf(c), (raw: String) => raw == v)
    case In(c, vs)             =>
      val set = vs.collect { case s: String => s }.toSet
      (p.cols.indexOf(c), (raw: String) => set.contains(raw))
    case IsNotNull(c)          => (p.cols.indexOf(c), (raw: String) => raw.nonEmpty)
    case f => throw new IllegalStateException(s"unpushable filter leaked: $f")
  }

  private def passes(fs: Seq[String]): Boolean = {
    var i = 0
    while (i < tests.length) {
      val (idx, test) = tests(i)
      val raw = if (idx >= 0 && idx < fs.length) fs(idx) else ""
      if (raw.isEmpty || !test(raw)) return false
      i += 1
    }
    true
  }
  private val reader = {
    val conf = new Configuration(false)
    confEntries.foreach { case (k, v) => conf.set(k, v) }
    val hp = new Path(p.path)
    new java.io.BufferedReader(new java.io.InputStreamReader(
      hp.getFileSystem(conf).open(hp), java.nio.charset.StandardCharsets.UTF_8))
  }
  private var lineIdx = -1L
  private var current: InternalRow = _

  override def next(): Boolean = {
    var line = reader.readLine()
    while (line != null) {
      lineIdx += 1
      if (lineIdx >= p.endIdx) return false
      if (lineIdx > p.atrIdx) {
        val t = line.trim
        if (t.startsWith("rec;")) {
          val fs = VdvX10.splitFields(t)
          if (passes(fs)) { current = parse(fs); return true }
        }
      }
      line = reader.readLine()
    }
    false
  }

  private def parse(fs: Seq[String]): InternalRow = {
    val vals = new Array[Any](required.length)
    var i = 0
    while (i < required.length) {
      val idx = colIdx(i)
      val raw = if (idx >= 0 && idx < fs.length) fs(idx) else ""
      vals(i) =
        if (raw.isEmpty) null
        else required.fields(i).dataType match {
          case LongType =>
            try java.lang.Long.valueOf(raw.trim) catch { case _: Exception => null }
          case DoubleType =>
            try java.lang.Double.valueOf(raw.trim) catch { case _: Exception => null }
          case _ => UTF8String.fromString(raw)
        }
      i += 1
    }
    new GenericInternalRow(vals)
  }

  override def get(): InternalRow = current
  override def close(): Unit = reader.close()
}
