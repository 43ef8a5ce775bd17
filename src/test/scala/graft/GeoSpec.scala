package graft

import graft.core.Tables
import graft.ops.Geo
import graft.queries.SystemShapes
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Geometry operators (F23/F24/J12/A12): WKT linestring fold,
  * point-in-ring edge cases, and the q35 region-assignment query
  * against an exact driver-side containment oracle (q35 is rows-only
  * in CORRECTNESS — this spec is its hard signal).
  */
class GeoSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  /** The seven q35 fixture regions as WKT — must match
    * [[SystemShapes.geoJsonFixturePath]] feature for feature. */
  val fixturePolys = Seq(
    "AbuDhabi" -> "POLYGON ((54.0 24.0, 54.5 24.0, 54.5 24.6, 54.0 24.6, 54.0 24.0))",
    "AlAin"    -> "POLYGON ((55.5 24.0, 56.0 24.0, 56.0 24.5, 55.5 24.5, 55.5 24.0))",
    "AlDhafra" -> "POLYGON ((52.5 23.0, 54.0 23.0, 54.0 24.0, 52.5 24.0, 52.5 23.0))",
    "Central"  -> "POLYGON ((54.6 23.2, 55.3 23.4, 55.0 24.1, 54.6 23.2))",
    "Dart"     -> "POLYGON ((54.5 24.2, 55.0 24.4, 55.4 24.2, 55.1 24.6, 54.5 24.2))",
    "Donut"    -> "POLYGON ((55.6 23.1, 56.0 23.1, 56.0 23.9, 55.6 23.9, 55.6 23.1), (55.7 23.3, 55.9 23.3, 55.9 23.6, 55.7 23.6, 55.7 23.3))",
    "Isles"    -> "MULTIPOLYGON (((54.1 23.1, 54.4 23.1, 54.4 23.4, 54.1 23.4, 54.1 23.1)), ((54.6 23.7, 54.9 23.7, 54.9 23.9, 54.6 23.9, 54.6 23.7)))")

  test("GeoJson.readPolygons yields properties + full-ring WKT incl. holes and MultiPolygon (S13)") {
    val df = graft.io.GeoJson.readPolygons(spark,
      graft.queries.SystemShapes.geoJsonFixturePath)
    val rows = df.select($"region_id", $"wkt").as[(String, String)].collect().toSet
    assert(rows == fixturePolys.map(t => (t._1, t._2)).toSet)
    // the parsed ring round-trips through the point-in-ring kernel
    val (xs, ys) = Geo.parseWktPolygonRing(
      rows.find(_._1 == "AbuDhabi").get._2)
    assert(Geo.pointInRing(54.2, 24.3, xs, ys))
  }

  test("Dart fixture: bounding-box answer differs from the ray-cast answer") {
    // the property the concave oracle fixture exists to pin
    // (scripts/verify_q35_dart.py re-proves it over the whole
    // reachable lattice): points inside the Dart's bbox — (54.8,24.3)
    // even inside its convex hull, where a ray crosses the notch's two
    // edges — are OUTSIDE the polygon, so a bbox/hull impostor
    // implementation diverges on c_custkey-reachable points.
    val (xs, ys) = Geo.parseWktPolygonRing(
      "POLYGON ((54.5 24.2, 55.0 24.4, 55.4 24.2, 55.1 24.6, 54.5 24.2))")
    val bboxPocket = Seq((54.5, 24.5), (54.7, 24.2), (54.8, 24.3),
      (55.2, 24.2), (55.4, 24.4))
    bboxPocket.foreach { case (lon, lat) =>
      assert(lon >= xs.min && lon <= xs.max && lat >= ys.min && lat <= ys.max,
        s"($lon,$lat) must sit inside the bbox")
      assert(!Geo.pointInRing(lon, lat, xs, ys),
        s"($lon,$lat) must be outside the concave polygon")
    }
    Seq((54.9, 24.4), (55.0, 24.5), (55.3, 24.3)).foreach { case (lon, lat) =>
      assert(Geo.pointInRing(lon, lat, xs, ys), s"($lon,$lat) must be inside")
    }
  }

  test("wktLineString folds points in serial order") {
    val got = Seq((1, 2, 54.5, 24.2), (1, 1, 54.0, 24.0), (1, 3, 55.0, 24.5))
      .toDF("link", "serial", "lon", "lat")
      .groupBy($"link")
      .agg(Geo.wktLineString($"serial", $"lon", $"lat").as("wkt"))
      .select($"wkt").as[String].head()
    assert(got == "LINESTRING (54.0 24.0, 54.5 24.2, 55.0 24.5)")
  }

  test("pointInRing: interior, exterior, and non-convex ring") {
    val (xs, ys) = Geo.parseWktPolygonRing(
      "POLYGON ((0 0, 4 0, 4 4, 2 2, 0 4, 0 0))") // notch at the top
    assert(Geo.pointInRing(1.0, 1.0, xs, ys))      // interior
    assert(!Geo.pointInRing(5.0, 1.0, xs, ys))     // exterior
    assert(!Geo.pointInRing(2.0, 3.5, xs, ys))     // inside the notch
    assert(Geo.pointInRing(3.5, 1.0, xs, ys))      // interior near edge
  }

  test("assignRegion (codegen kernel) matches a brute-force oracle and the UDF twin") {
    val parsed = fixturePolys.map { case (r, w) => (r, Geo.parseWktRings(w)) }
    val pts = Tables.customer(spark, SparkTestBase.sf).select(
      $"c_custkey",
      (lit(52.6) + ($"c_custkey" % 35) * 0.1).as("lon"),
      (lit(23.1) + ($"c_custkey" % 15) * 0.1).as("lat"))
    val got = Geo.assignRegion(pts, "lon", "lat", fixturePolys)
      .select($"c_custkey", $"region_id").as[(Long, String)].collect().toMap
    // the boxed-UDF twin decides identically row for row
    val gotUdf = Geo.assignRegionUdf(pts, "lon", "lat", fixturePolys)
      .select($"c_custkey", $"region_id").as[(Long, String)].collect().toMap
    assert(got == gotUdf)
    val coords = pts.as[(Long, Double, Double)].collect()
    coords.foreach { case (k, lon, lat) =>
      val want = parsed.collectFirst {
        case (r, rings) if Geo.pointInRings(lon, lat, rings) => r
      }.orNull
      assert(got(k) == want, s"custkey=$k ($lon,$lat): got ${got(k)}, want $want")
    }
    assert(coords.nonEmpty)
    // the reachable lattice hits the new shapes: hole points unassigned,
    // both islands and the donut body populated
    val byRegion = coords.groupBy(t => got(t._1))
    assert(byRegion.contains("Donut") && byRegion.contains("Isles"))
    assert(coords.exists { case (k, lon, lat) =>
      lon >= 55.65 && lon < 55.95 && lat >= 23.25 && lat < 23.65 &&
        got(k) == null
    }, "some reachable point must fall in the Donut hole and stay unassigned")
  }

  test("parseWktRings + pointInRings: holes carve out, islands add in") {
    // donut: unit square with a centered square hole
    val donut = Geo.parseWktRings(
      "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 3 1, 3 3, 1 3, 1 1))")
    assert(donut.length == 2)
    assert(Geo.pointInRings(0.5, 0.5, donut))   // in the rim
    assert(!Geo.pointInRings(2.0, 2.0, donut))  // in the hole
    assert(!Geo.pointInRings(5.0, 2.0, donut))  // outside entirely
    // hole orientation is irrelevant to even-odd parity
    val donutCw = Geo.parseWktRings(
      "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 1 3, 3 3, 3 1, 1 1))")
    assert(!Geo.pointInRings(2.0, 2.0, donutCw) &&
      Geo.pointInRings(0.5, 0.5, donutCw))
    // multipolygon: two disjoint islands, one carrying its own hole
    val isles = Geo.parseWktRings(
      "MULTIPOLYGON (((0 0, 2 0, 2 2, 0 2, 0 0), (0.5 0.5, 1.5 0.5, 1.5 1.5, 0.5 1.5, 0.5 0.5)), " +
        "((5 5, 7 5, 7 7, 5 7, 5 5)))")
    assert(isles.length == 3)
    assert(Geo.pointInRings(0.25, 0.25, isles)) // island 1 rim
    assert(!Geo.pointInRings(1.0, 1.0, isles))  // island 1 hole
    assert(Geo.pointInRings(6.0, 6.0, isles))   // island 2
    assert(!Geo.pointInRings(3.5, 3.5, isles))  // the water between
    // single-ring view stays available for plain polygons
    val (xs, ys) = Geo.parseWktPolygonRing(
      "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))")
    assert(xs.length == 5 && ys.length == 5)
  }

  test("q35 aggregate equals an independent driver-side computation") {
    val got = graft.SparkEntry.queries("q35_geo_region_assign")(spark, SparkTestBase.sf)
      .as[(String, Long, Double, Double)].collect().toSeq
    val polys = fixturePolys.map { case (r, w) => (r, Geo.parseWktRings(w)) }
    val keys = Tables.customer(spark, SparkTestBase.sf)
      .select($"c_custkey").as[Long].collect()
    val assigned = keys.map { k =>
      val lonE1 = 526L + k % 35
      val latE1 = 231L + k % 15
      val r = polys.collectFirst {
        case (rid, rings) if Geo.pointInRings(lonE1 / 10.0, latE1 / 10.0, rings) => rid
      }.getOrElse("Unassigned")
      (r, lonE1, latE1)
    }
    // means recomputed with q35's exact half-up integer arithmetic
    // (sum(e1)*1000 / n at scale 4), not double rounding
    def halfUp4(sumE1: Long, n: Long): Double =
      ((2 * sumE1 * 1000 + n) / (2 * n)).toDouble / 10000.0
    val want = assigned.groupBy(_._1).map { case (r, g) =>
      (r, g.length.toLong,
        halfUp4(g.map(_._2).sum, g.length),
        halfUp4(g.map(_._3).sum, g.length))
    }.toSeq.sortBy(_._1)
    assert(got == want, s"got=$got want=$want")
  }
}
