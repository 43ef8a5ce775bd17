package graft.pipelines

import graft.core.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The "other 2" dwd dimension tables of
  * `scripts/dwd_bus_route_info_mf & other 2.R` (q38 carries the first):
  *
  *  - `dwd_bus_route_stop_info_mf` (`dwd...R:288-312`): route_sequence
  *    projected/renamed, left-joined to the routes lookup for
  *    direction, audit literals, ordered by (line, route, stop_index).
  *  - `dwd_bus_stop_info_mf` (`dwd...R:335-380`): stops with WKT POINT
  *    geometry and a region from a spatial within-test against the
  *    region polygons (the R `st_join(st_within)`), NA equipment
  *    columns preserved, audit literals.
  *
  * Fixture mapping matches q38 (routes/stops derive from lineitem/
  * part), with one deliberate difference: stop coordinate milliseconds
  * are key%997+1 / key%991+1 — never zero — so (except where
  * microdegree rounding collapses the sub-milliarcsecond offset back
  * onto a degree boundary, possible only at keys ≡ 0 mod 59820) stops
  * sit strictly inside or outside the rectangles. Edge-landing points
  * classify identically in both engines anyway: the comparison runs on
  * the SAME integer microdegree value against the same strict bounds.
  * The region polygons here are the q35 GeoJSON fixture's axis-aligned
  * rectangles, so `within` reduces to exact integer-microdegree range
  * checks — ANSI-expressible, which is what lets this table carry a
  * full DuckDB oracle while q35 keeps the general ray-casting path
  * (GeoSpec holds its exact oracle).
  */
object StopDims {

  import graft.ops.Geo.{dmsToMicroDeg, microDegText}

  /** Route-stop sequence dim — pure relational (J9-family). */
  def dwdBusRouteStopInfo(s: SparkSession, dir: String): DataFrame = {
    val seqNumW = Window.partitionBy(col("l_orderkey"))
      .orderBy(col("l_linenumber"), col("l_partkey"))
    // anchored at min(l_orderkey) + 400 (Tables.minId): translation-
    // invariant fixture window, same rows wherever ids start at 0
    val li = Tables.lineitem(s, dir)
    val routeSeq = li
      .where(col("l_orderkey") < Tables.minId(li, "l_orderkey") + 400L)
      .select(
        col("l_orderkey").as("line_no"),
        lit("R").as("route_no"),
        lit(1L).as("version"),
        col("l_partkey").cast("string").as("stop_no"),
        row_number().over(seqNumW).cast("string").as("stop_index"))
    val routeLkp = routeSeq.select(col("line_no"), col("route_no")).distinct()
      .withColumn("direction", (col("line_no") % 2).cast("string"))
    routeSeq
      .join(broadcast(routeLkp), Seq("line_no", "route_no"), "left")
      .select(col("route_no"), col("version"), col("stop_no"),
        col("stop_index"), col("line_no"), col("direction"),
        lit("system").as("create_by"), lit("system").as("update_by"),
        lit("20250807_11:07:58").as("create_time"),
        lit("20250807_11:07:58").as("update_time"))
      .orderBy(col("line_no"), col("route_no"),
        col("stop_index").cast("int"))
  }

  /** Stop dim with WKT POINT geom and rectangle-region assignment. */
  def dwdBusStopInfo(s: SparkSession, dir: String): DataFrame = {
    val stops = Tables.part(s, dir).select(
      col("p_partkey").as("key"),
      col("p_name").as("stop_name"),
      ((lit(54) + col("p_partkey") % 3) * 10000000L +
        (col("p_partkey") * 7 % 60) * 100000L +
        (col("p_partkey") * 13 % 60) * 1000L +
        (col("p_partkey") % 997 + 1)).as("lon_dms"),
      ((lit(23) + col("p_partkey") % 2) * 10000000L +
        (col("p_partkey") * 11 % 60) * 100000L +
        (col("p_partkey") * 17 % 60) * 1000L +
        (col("p_partkey") % 991 + 1)).as("lat_dms"))
    val withCoords = stops
      .withColumn("lon_u", dmsToMicroDeg(col("lon_dms")))
      .withColumn("lat_u", dmsToMicroDeg(col("lat_dms")))
    // q35 fixture rectangles in integer microdegrees (strict interior —
    // the ms offsets guarantee no point sits on an edge)
    def in(lon1: Long, lat1: Long, lon2: Long, lat2: Long): Column =
      col("lon_u") > lon1 && col("lon_u") < lon2 &&
      col("lat_u") > lat1 && col("lat_u") < lat2
    val region =
      when(in(54000000L, 24000000L, 54500000L, 24600000L), "AbuDhabi")
        .when(in(55500000L, 24000000L, 56000000L, 24500000L), "AlAin")
        .when(in(52500000L, 23000000L, 54000000L, 24000000L), "AlDhafra")
        .otherwise(lit(null).cast("string"))
    withCoords.select(
        col("key").cast("string").as("stop_no"),
        col("stop_name"),
        (col("key") % 20 + 5).cast("int").as("bay_size"),
        (lit(1) + col("key") % 2).cast("string").as("stop_type"),
        lit(null).cast("int").as("is_afc"),
        lit(null).cast("int").as("bus_shelter"),
        lit(null).cast("int").as("platform_type"),
        lit(null).cast("int").as("active_status"),
        format_string("POINT (%s %s)",
          microDegText(col("lon_u")), microDegText(col("lat_u"))).as("geom"),
        region.as("region_id"),
        lit("202505080912").as("version"),
        lit("system").as("create_by"), lit("system").as("update_by"),
        lit("20250807_11:07:58").as("create_time"),
        lit("20250807_11:07:58").as("update_time"))
      .orderBy(col("stop_no").cast("long"))
  }
}
