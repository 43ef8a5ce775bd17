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

  /** Parse `POLYGON ((x y, x y, ...))` outer-ring WKT into parallel
    * coordinate arrays (driver-side; polygons are dimension data). */
  def parseWktPolygonRing(wkt: String): (Array[Double], Array[Double]) = {
    val inner = wkt.trim
      .replaceFirst("(?i)^POLYGON\\s*\\(\\(", "")
      .replaceFirst("\\)\\).*$", "")
    val pts = inner.split(",").map(_.trim.split("\\s+"))
    (pts.map(_(0).toDouble), pts.map(_(1).toDouble))
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

  /** J12 — spatial join: assign each point row the region_id of the
    * first polygon containing it (left join semantics: no match →
    * null). `polygons` must be small — it is collected and broadcast
    * inside a codegen'd predicate; the point side never shuffles. */
  def assignRegion(points: DataFrame, lonCol: String, latCol: String,
                   polygons: Seq[(String, String)]): DataFrame = {
    val parsed = polygons.map { case (rid, wkt) =>
      val (xs, ys) = parseWktPolygonRing(wkt); (rid, xs, ys) }
    val pip = udf((lon: Double, lat: Double) =>
      parsed.collectFirst {
        case (rid, xs, ys) if pointInRing(lon, lat, xs, ys) => rid
      }.orNull)
    points.withColumn("region_id", pip(col(lonCol), col(latCol)))
  }
}
