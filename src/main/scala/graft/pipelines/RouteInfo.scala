package graft.pipelines

import graft.core.Tables
import graft.ops.Geo
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** EP3-adjacent — the `dwd_bus_route_info_mf` VDV-network flow
  * (`scripts/dwd_bus_route_info_mf & other 2.R:99-231`) as one plan:
  *
  *   point_on_link ⟕ STOP (multi-key J9) → DMS→decimal (F22, custom
  *   codegen Expression) → per-link ordered LINESTRING fold (A12/F23) →
  *   route sequence lead (W5) → link join w/ column-pattern selection
  *   (J10) → route length sum (A13) → first/last stop per route (A14,
  *   min_by/max_by) → stop-name dim joined twice (J11) → per-route
  *   geometry combine → output.
  *
  * Fixture mapping (the driver's DuckDB oracle must see the same
  * inputs, so the network derives deterministically from parquet
  * tables rather than a .x10 file — the .x10 read path itself is
  * covered by q34 + VdvX10Spec): stops come from `part` (point_no =
  * p_partkey, DMS-millisecond coordinates synthesized from the key in
  * the reference's `dddmmssnnn` format), route sequences from
  * a 400-order lineitem window anchored at min(l_orderkey) — id-
  * translation-safe, see Tables.minId (line_no = l_orderkey, sequence_no =
  * l_linenumber, point_no = l_partkey), links from consecutive
  * sequence pairs with a key-derived integer distance.
  *
  * WKT coordinates are exact integer MICRODEGREES formatted as
  * `d.dddddd` — the integer twin of F22's round-6
  * (`convert_to_decimal`, `dwd...R:32-51`; the double-valued
  * [[graft.functions.DmsToDecimalDegrees]] expression is oracle-checked
  * in q18): decimal degrees × 1e6 = (deg·36e8 + min·6e7 + sec·1e6 +
  * ms·1e3) / 3600 rounded half-up in pure integer arithmetic, so both
  * engines produce byte-identical text (round-6-then-format on doubles
  * diverges at 1-ulp ties).
  */
object RouteInfo {

  import Geo.{dmsToMicroDeg, microDegText}

  def dwdBusRouteInfo(s: SparkSession, dir: String): DataFrame = {
    // --- STOP dim: DMS coords synthesized from the part key ----------
    val stops = Tables.part(s, dir).select(
      col("p_partkey").as("point_no"),
      (lit(1) + col("p_partkey") % 2).as("point_type"),
      ((lit(54) + col("p_partkey") % 3) * 10000000L +
        (col("p_partkey") * 7 % 60) * 100000L +
        (col("p_partkey") * 13 % 60) * 1000L +
        col("p_partkey") % 1000).as("lon_dms"),
      ((lit(23) + col("p_partkey") % 2) * 10000000L +
        (col("p_partkey") * 11 % 60) * 100000L +
        (col("p_partkey") * 17 % 60) * 1000L +
        col("p_partkey") % 997).as("lat_dms"),
      col("p_name").as("stop_desc"))

    // --- ROUTE_SEQUENCE + W5 lead over the sequence ------------------
    // The fixture has duplicate (l_orderkey, l_linenumber) pairs, so
    // sequence_no is re-derived as a row_number over the composite
    // (l_linenumber, l_partkey) ordering — deterministic in both
    // engines (rows tying on both produce identical points, so any
    // residual order between them is output-invariant).
    val seqW = Window.partitionBy(col("line_no"), col("route_abbr"))
      .orderBy(col("sequence_no"))
    val seqNumW = Window.partitionBy(col("l_orderkey"))
      .orderBy(col("l_linenumber"), col("l_partkey"))
    // route subset anchored at min(l_orderkey) + 400, not an absolute
    // id, so the window survives id-translated fixtures (Tables.minId)
    val li = Tables.lineitem(s, dir)
    val routeSeq = li
      .where(col("l_orderkey") < Tables.minId(li, "l_orderkey") + 400L)
      .select(
        col("l_orderkey").as("line_no"),
        lit("R").as("route_abbr"),
        row_number().over(seqNumW).as("sequence_no"),
        col("l_partkey").as("point_no"),
        (lit(1) + col("l_partkey") % 2).as("point_type"))
    // `processed` feeds three consumers (link derivation, route-length
    // join, shape join) — persist so the scan + two windows run once
    // (SURVEY.md §4 shared-subplan reuse).
    val processed = graft.core.Caching.eager(routeSeq
      .withColumn("to_point_no", lead(col("point_no"), 1).over(seqW))
      .withColumn("to_point_type", lead(col("point_type"), 1).over(seqW))
      .where(col("to_point_no").isNotNull))

    // --- LINK table: consecutive pairs + key-derived metrics ---------
    // Wider than needed on purpose: J10 selects the join key plus only
    // the *_DISTANCE column by name pattern (`dwd...R:175-177`).
    val linkFull = processed
      .select(col("point_type"), col("point_no"),
        col("to_point_no"), col("to_point_type"))
      .distinct()
      .withColumn("link_distance",
        (col("point_no") * 7 + col("to_point_no") * 3) % 5000)
      .withColumn("link_length_km", col("link_distance") / 1000.0)
      .withColumn("link_speed_class", col("link_distance") % 5)
    val linkKey = Seq("point_type", "point_no", "to_point_no", "to_point_type")
    val link = linkFull.select(
      (linkKey ++ linkFull.columns.filter(_.toUpperCase.contains("DISTANCE")))
        .map(col): _*)

    // --- link geometries: 2 serial points/link ⟕ STOP (J9) → WKT fold
    val linkPts = linkFull
      .select(col("point_type"), col("point_no"),
        col("to_point_no"), col("to_point_type"))
      .withColumn("pt", explode(array(
        struct(lit(1).as("serial"), col("point_no").as("pn"), col("point_type").as("pt_type")),
        struct(lit(2).as("serial"), col("to_point_no").as("pn"), col("to_point_type").as("pt_type")))))
      .select(col("point_type"), col("point_no"), col("to_point_no"),
        col("to_point_type"), col("pt.serial").as("serial"),
        col("pt.pn").as("stop_no"), col("pt.pt_type").as("stop_type"))
    val withCoords = linkPts
      .join(stops.withColumnRenamed("point_no", "stop_no")
          .withColumnRenamed("point_type", "stop_type"),
        Seq("stop_no", "stop_type"), "left")
      .withColumn("lon_micro", dmsToMicroDeg(col("lon_dms")))
      .withColumn("lat_micro", dmsToMicroDeg(col("lat_dms")))
      .where(col("lon_micro").isNotNull)
    val linkGeom = withCoords
      .groupBy(col("point_type"), col("point_no"),
        col("to_point_no"), col("to_point_type"))
      .agg(Geo.wktLineString(col("serial"),
        microDegText(col("lon_micro")),
        microDegText(col("lat_micro"))).as("wkt"))

    // --- route lengths (A13) over the pattern-projected link (J10) ---
    val routeLengths = processed
      .join(link, linkKey, "left")
      .groupBy(col("line_no"), col("route_abbr"))
      .agg(sum(coalesce(col("link_distance"), lit(0L))).as("route_length_m"))

    // --- first/last stop per route (A14) + stop names twice (J11) ----
    val firstLast = routeSeq
      .groupBy(col("line_no"), col("route_abbr"))
      .agg(min_by(col("point_no"), col("sequence_no")).as("first_stop_no"),
           max_by(col("point_no"), col("sequence_no")).as("last_stop_no"))
    val stopNames = stops.select(col("point_no"), col("stop_desc"))
    val named = firstLast
      .join(stopNames.as("sn1"),
        col("first_stop_no") === col("sn1.point_no"), "left")
      .withColumnRenamed("stop_desc", "from_stop_name")
      .drop(col("sn1.point_no"))
      .join(stopNames.as("sn2"),
        col("last_stop_no") === col("sn2.point_no"), "left")
      .withColumnRenamed("stop_desc", "to_stop_name")
      .drop(col("sn2.point_no"))

    // --- per-route geometry combine (ordered st_combine analog) ------
    val shapes = processed
      .join(linkGeom, linkKey, "left")
      .groupBy(col("line_no"), col("route_abbr"))
      .agg(
        count(lit(1)).as("n_links"),
        array_join(transform(
          sort_array(collect_list(struct(col("sequence_no").as("o"), col("wkt").as("w")))),
          p => p.getField("w")), "; ").as("geometry"))

    shapes
      .join(routeLengths, Seq("line_no", "route_abbr"))
      .join(named, Seq("line_no", "route_abbr"))
      .select(
        col("line_no"), col("route_abbr").as("route_no"),
        col("n_links"), col("route_length_m"),
        col("first_stop_no"), col("last_stop_no"),
        col("from_stop_name"), col("to_stop_name"), col("geometry"))
      .orderBy(col("line_no"), col("route_no"))
  }
}
