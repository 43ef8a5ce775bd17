package graft.io

import java.io.ByteArrayInputStream
import java.util.zip.ZipFile

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import javax.xml.parsers.DocumentBuilderFactory
import org.w3c.dom.{Document, Element}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** S12 — native Excel (.xlsx) dimension scan, no external libraries:
  * xlsx is a ZIP of XML parts (ECMA-376 SpreadsheetML), so
  * `java.util.zip` + the JDK's DOM parser cover the whole format
  * surface a dimension workbook uses (shared strings, inline strings,
  * numbers, booleans, sparse rows). Reference behavior being replaced:
  * `pd.read_excel` of service-type / region dim sheets
  * (`scripts/ads_ridership_passenger_trips_di - first 6 months
  * 2025.py:19`); until this reader, those went through the
  * `scripts/convert_excel_dims.py` CSV preconversion (the SURVEY.md S12
  * disposition — now only a fallback).
  *
  * Scale stance: dimension workbooks are driver-sized BY DEFINITION
  * (hand-maintained sheets, thousands of rows at most) — the file is
  * parsed on the driver and handed to the cluster as a local relation,
  * exactly like [[GeoJson]] polygons and the VdvX10 section index. A
  * multi-GB fact table in xlsx would be the wrong container long before
  * it is the wrong reader.
  *
  * Output contract: every column is a STRING column named by the header
  * row (first non-empty sheet row); numbers pass through as the raw
  * stored text (`<v>` content), booleans as "true"/"false", missing
  * cells as NULL. Callers cast, exactly as with `readCsvExplicit`.
  */
object Xlsx {

  private def parseXml(bytes: Array[Byte]): Document = {
    val f = DocumentBuilderFactory.newInstance()
    // dim files are local trusted deploy artifacts, but there is no
    // reason to ever follow external entities from a spreadsheet
    f.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
    f.setNamespaceAware(false)
    f.newDocumentBuilder().parse(new ByteArrayInputStream(bytes))
  }

  /** Tag match tolerant of namespace prefixes: legal OOXML may write
    * `<x:row>` for the same element (namespaceAware is off, so the
    * prefix stays in the tag name); match the local part. */
  private def tagMatches(name: String, tag: String): Boolean =
    name == tag || name.endsWith(":" + tag)

  private def elems(doc: Document, tag: String): Seq[Element] = {
    val nl = doc.getElementsByTagName("*")
    (0 until nl.getLength).map(nl.item(_).asInstanceOf[Element])
      .filter(e => tagMatches(e.getTagName, tag))
  }
  private def childElems(e: Element, tag: String): Seq[Element] = {
    val nl = e.getElementsByTagName("*")
    (0 until nl.getLength).map(nl.item(_).asInstanceOf[Element])
      .filter(c => tagMatches(c.getTagName, tag))
  }

  /** Cell text of a rich-text container (`<si>` or an inline-string
    * `<c>`): the concat of its `<t>` runs, SKIPPING phonetic `<rPh>`
    * subtrees — workbooks saved by East-Asian Excel locales store the
    * furigana/pinyin reading there, and concatenating every descendant
    * `<t>` silently appends the phonetic transcription to the value. */
  private def richText(container: Element): String =
    childElems(container, "t").filter { t =>
      var p = t.getParentNode
      var phonetic = false
      while (p != null && (p ne container) && p.isInstanceOf[Element]) {
        if (tagMatches(p.asInstanceOf[Element].getTagName, "rPh")) phonetic = true
        p = p.getParentNode
      }
      !phonetic
    }.map(_.getTextContent).mkString

  /** "BC12" → 0-based column index of the letter prefix (A=0, Z=25, AA=26). */
  private[graft] def colIndex(ref: String): Int = {
    val letters = ref.takeWhile(_.isLetter)
    require(letters.nonEmpty, s"cell ref without column letters: '$ref'")
    letters.foldLeft(0)((a, c) => a * 26 + (c.toUpper - 'A' + 1)) - 1
  }

  private def readEntry(zip: ZipFile, name: String): Option[Array[Byte]] =
    Option(zip.getEntry(name)).map { e =>
      val in = zip.getInputStream(e)
      try in.readAllBytes() finally in.close()
    }

  /** All sheet names in workbook order. */
  def sheetNames(path: String): Seq[String] = {
    val zip = new ZipFile(path)
    try {
      val wb = parseXml(readEntry(zip, "xl/workbook.xml")
        .getOrElse(throw new IllegalArgumentException(s"$path: no xl/workbook.xml — not an xlsx")))
      elems(wb, "sheet").map(_.getAttribute("name"))
    } finally zip.close()
  }

  /** Parse one sheet to (header, rows) of raw string cells. */
  private def parseSheet(path: String, sheet: Option[String]): (Seq[String], Seq[Seq[String]]) = {
    val zip = new ZipFile(path)
    try {
      val wb = parseXml(readEntry(zip, "xl/workbook.xml")
        .getOrElse(throw new IllegalArgumentException(s"$path: no xl/workbook.xml — not an xlsx")))
      val sheets = elems(wb, "sheet")
      require(sheets.nonEmpty, s"$path: workbook has no sheets")
      val picked = sheet match {
        case None => sheets.head
        case Some(n) => sheets.find(_.getAttribute("name") == n).getOrElse(
          throw new IllegalArgumentException(
            s"$path: no sheet named '$n' (have: ${sheets.map(_.getAttribute("name")).mkString(", ")})"))
      }
      val rid = picked.getAttribute("r:id")

      // r:id → part path via the workbook rels
      val rels = parseXml(readEntry(zip, "xl/_rels/workbook.xml.rels")
        .getOrElse(throw new IllegalArgumentException(s"$path: missing workbook rels")))
      val target = elems(rels, "Relationship")
        .find(_.getAttribute("Id") == rid)
        .map(_.getAttribute("Target"))
        .getOrElse(throw new IllegalArgumentException(s"$path: unresolved sheet rel $rid"))
      val part = if (target.startsWith("/")) target.drop(1) else s"xl/$target"

      // shared strings: <si> in order, each the concat of its <t> runs
      // (phonetic <rPh> subtrees excluded — see richText)
      val shared: IndexedSeq[String] =
        readEntry(zip, "xl/sharedStrings.xml").map { b =>
          elems(parseXml(b), "si").map(richText).toIndexedSeq
        }.getOrElse(IndexedSeq.empty)

      val ws = parseXml(readEntry(zip, part)
        .getOrElse(throw new IllegalArgumentException(s"$path: missing sheet part $part")))
      val rows = elems(ws, "row").map { r =>
        val cells = mutable.Map.empty[Int, String]
        var nextCol = 0
        childElems(r, "c").foreach { c =>
          val idx = Option(c.getAttribute("r")).filter(_.nonEmpty)
            .map(colIndex).getOrElse(nextCol)
          nextCol = idx + 1
          val t = c.getAttribute("t")
          val v: Option[String] = t match {
            case "inlineStr" =>
              Some(richText(c))
            case "s" =>
              childElems(c, "v").headOption.map(x => shared(x.getTextContent.trim.toInt))
            case "b" =>
              childElems(c, "v").headOption.map(x =>
                if (x.getTextContent.trim == "1") "true" else "false")
            case _ => // "" number, "str" formula result, "e" error text
              childElems(c, "v").headOption.map(_.getTextContent)
          }
          v.foreach(cells(idx) = _)
        }
        cells
      }.filter(_.nonEmpty)

      require(rows.nonEmpty, s"$path: sheet has no non-empty rows")
      val width = rows.map(r => r.keys.max + 1).max
      def dense(r: mutable.Map[Int, String]): Seq[String] =
        (0 until width).map(i => r.getOrElse(i, null))
      val header = dense(rows.head).zipWithIndex.map {
        case (null, i) => s"_c$i"
        case (h, _)    => h
      }
      (header, rows.tail.map(dense))
    } finally zip.close()
  }

  /** Read a sheet (first sheet when `sheet` is None) as an all-string
    * DataFrame, header from the first row. */
  def readSheet(spark: SparkSession, path: String, sheet: Option[String] = None): DataFrame = {
    val (header, data) = parseSheet(path, sheet)
    val schema = StructType(header.map(StructField(_, StringType, nullable = true)))
    spark.createDataFrame(data.map(Row.fromSeq).asJava, schema)
  }
}
