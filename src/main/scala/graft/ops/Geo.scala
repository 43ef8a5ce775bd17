package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Geospatial operators (SURVEY.md §2.8 F23-F24, §2.3 J12): WKT
  * construction from ordered coordinate groups, and point-in-polygon
  * region assignment — the reference's `sf` usage
  * (`dwd_bus_route_info_mf & other 2.R:97-119,338-340`) restated
  * without a geo library.
  *
  * Spark has no native geometry type; geometries are modeled as
  * lon/lat double columns + WKT strings (SURVEY.md §1.1). Polygons are
  * tiny (emirate regions) → broadcast; the point side streams.
  */
object Geo {

  /** DMS-milliseconds (`dddmmssnnn`, positive) → integer microdegrees,
    * half-up — the exact-integer twin of the float
    * [[graft.functions.DmsToDecimalDegrees]] Expression, shared by the
    * q38 route-geometry and q49/q50 stop-dim pipelines (rounding-
    * critical: both DuckDB oracles replay this arithmetic). All
    * intermediates ≤ ~2e12, exact in double; the /3600 quotient can't
    * straddle an integer boundary (remainder/3600 ≤ 0.99972 vs
    * ulp(5.6e7) ≈ 7.5e-9), so divide-then-truncate is an exact integer
    * division. */
  def dmsToMicroDeg(x: Column): Column = {
    val n = (x / 10000000L).cast("long") * 3600000000L +
      ((x / 100000L).cast("long") % 100L) * 60000000L +
      ((x / 1000L).cast("long") % 100L) * 1000000L +
      (x % 1000L) * 1000L
    ((n + 1800L) / 3600L).cast("long")
  }

  /** Fixed-6-decimal coordinate text from integer microdegrees. */
  def microDegText(micro: Column): Column =
    format_string("%d.%06d",
      (micro / 1000000L).cast("long"), micro % 1000000L)

  /** A12+F23 — fold an ordered per-group point set into a WKT
    * LINESTRING: `sort_array(collect_list(struct(ord, lon, lat)))` then
    * textual assembly, all expression-level (no UDF).
    * Mirrors `arrange(serial_no) %>% summarize(st_linestring)`
    * (`dwd...R:109-115`). */
  def wktLineString(ordCol: Column, lonCol: Column, latCol: Column): Column = {
    val pts = sort_array(collect_list(struct(ordCol.as("o"),
      lonCol.as("x"), latCol.as("y"))))
    concat(lit("LINESTRING ("),
      concat_ws(", ", transform(pts,
        p => concat(p.getField("x").cast("string"), lit(" "),
                    p.getField("y").cast("string")))),
      lit(")"))
  }

  /** Parse `POLYGON ((x y, ...))` outer-ring WKT into parallel
    * coordinate arrays (driver-side; polygons are dimension data).
    * Single-ring view — holes and multipolygon parts need
    * [[parseWktRings]]. */
  def parseWktPolygonRing(wkt: String): (Array[Double], Array[Double]) =
    parseWktRings(wkt).head

  /** Parse POLYGON or MULTIPOLYGON WKT into ALL of its rings (outer
    * rings, interior hole rings, and every multipolygon part's rings,
    * in textual order). Rings are exactly the innermost parenthesis
    * groups in both WKT forms, so one extraction handles
    * `POLYGON ((outer), (hole))` and
    * `MULTIPOLYGON (((outer), (hole)), ((outer2)))` uniformly —
    * even-odd containment ([[pointInRings]]) needs no ring roles. */
  def parseWktRings(wkt: String): Array[(Array[Double], Array[Double])] = {
    val t = wkt.trim
    require(t.toUpperCase.startsWith("POLYGON") ||
      t.toUpperCase.startsWith("MULTIPOLYGON"),
      s"expected POLYGON/MULTIPOLYGON WKT: ${t.take(40)}")
    val rings = "\\(([^()]+)\\)".r.findAllMatchIn(t).map { m =>
      val pts = m.group(1).split(",").map(_.trim.split("\\s+"))
      (pts.map(_(0).toDouble), pts.map(_(1).toDouble))
    }.toArray
    require(rings.nonEmpty, s"no rings in WKT: ${t.take(40)}")
    rings
  }

  /** Even-odd ray casting on a closed ring; boundary-inclusive on
    * horizontal crossings the same way `sf::st_within`'s default
    * treats interiors (edge cases documented in GeoSpec; the reference
    * keeps geo off oracle paths — SURVEY.md §7.4 risk 5). */
  def pointInRing(lon: Double, lat: Double,
                  xs: Array[Double], ys: Array[Double]): Boolean = {
    var inside = false
    var i = 0
    var j = xs.length - 1
    while (i < xs.length) {
      val intersects = ((ys(i) > lat) != (ys(j) > lat)) &&
        (lon < (xs(j) - xs(i)) * (lat - ys(i)) / (ys(j) - ys(i)) + xs(i))
      if (intersects) inside = !inside
      j = i; i += 1
    }
    inside
  }

  /** Even-odd containment across ALL rings of one region: crossing
    * parity XORs over rings, so holes carve out and disjoint
    * multipolygon parts add in, independent of ring orientation. */
  def pointInRings(lon: Double, lat: Double,
                   rings: Array[(Array[Double], Array[Double])]): Boolean =
    rings.foldLeft(false) { case (acc, (xs, ys)) =>
      acc ^ pointInRing(lon, lat, xs, ys)
    }

  /** J12 — spatial join: assign each point row the region_id of the
    * first region (POLYGON or MULTIPOLYGON WKT, holes included)
    * containing it (left join semantics: no match → null). `polygons`
    * must be small — every ring rides into a codegen'd
    * [[graft.functions.PointRegionIndex]] kernel as flat primitive
    * reference arrays; the point side never shuffles and stays inside
    * WholeStageCodegen. */
  def assignRegion(points: DataFrame, lonCol: String, latCol: String,
                   polygons: Seq[(String, String)]): DataFrame = {
    import graft.functions.GeoKernels
    val idx = GeoKernels.buildIndex(
      polygons.map { case (rid, wkt) => (rid, parseWktRings(wkt)) })
    val g = GeoKernels.region_index(
      col(lonCol).cast("double"), col(latCol).cast("double"), idx)
    // get() is 0-based and yields NULL on -1 (no containing region) —
    // the left-join-no-match convention, without an ANSI element_at trap
    points.withColumn("region_id", get(typedLit(idx.ids.toSeq), g))
  }

  /** The boxed-UDF twin of [[assignRegion]] — kept as the
    * CodegenParitySpec oracle for the [[graft.functions.GeoKernels]]
    * kernel (same first-match and even-odd multi-ring semantics). */
  def assignRegionUdf(points: DataFrame, lonCol: String, latCol: String,
                      polygons: Seq[(String, String)]): DataFrame = {
    val parsed = polygons.map { case (rid, wkt) =>
      (rid, parseWktRings(wkt)) }
    val pip = udf((lon: Double, lat: Double) =>
      parsed.collectFirst {
        case (rid, rings) if pointInRings(lon, lat, rings) => rid
      }.orNull)
    points.withColumn("region_id", pip(col(lonCol), col(latCol)))
  }
}
