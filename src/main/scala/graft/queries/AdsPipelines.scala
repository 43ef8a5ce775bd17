package graft.queries

import graft.QueryDef
import graft.pipelines.{DimDate, FareRevenue, Revenue, Ridership, RouteInfo, RouteTrips, StopDims, StopTrips, TransferCount, TravelDistance, TravelInfo, TravelTime}
import org.apache.spark.sql.functions._

/** End-to-end ads-table pipelines (SURVEY.md §3 entry points composed
  * as single plans — the reference's actual product, not just its
  * operators). Each carries a full DuckDB oracle.
  */
object AdsPipelines {

  /** EP1 `ads_passenger_travel_info_mi` — see
    * [[graft.pipelines.TravelInfo.adsTravelInfoMonthly]]. */
  val q39 = QueryDef(
    "q39_ads_travel_info_pipeline",
    (s, dir) => TravelInfo.adsTravelInfoMonthly(s, dir),
    Some("""WITH line AS (
           |  SELECT line_clean, min(line_abbr) AS line_abbr,
           |    length(min(line_abbr)) % 6 AS op_dep_no
           |  FROM (SELECT DISTINCT event_type AS line_abbr,
           |          upper(regexp_replace(trim(event_type), '[^A-Za-z0-9]', '', 'g')) AS line_clean
           |        FROM events)
           |  GROUP BY line_clean),
           |legs AS (
           |  SELECT e.user_id, e.event_id, e.ts, e.value,
           |    r.r_name AS region_id,
           |    strftime(e.ts, '%Y-%m-%d') AS day,
           |    strftime(e.ts, '%Y-%m') AS month,
           |    epoch_us(e.ts) AS start_us,
           |    epoch_us(e.ts) + CAST(round(e.value * 60000000) AS BIGINT) AS end_us
           |  FROM events e
           |  LEFT JOIN line l
           |    ON upper(regexp_replace(trim(e.event_type), '[^A-Za-z0-9]', '', 'g')) = l.line_clean
           |  LEFT JOIN region r ON l.op_dep_no = r.r_regionkey
           |  WHERE r.r_name IS NOT NULL),
           |wt2 AS (
           |  SELECT *,
           |    CAST(round(value * 100) AS BIGINT) AS dist_cm,
           |    row_number() OVER w AS leg_id,
           |    lead(start_us) OVER w AS next_start_us
           |  FROM legs
           |  WINDOW w AS (PARTITION BY user_id, day ORDER BY ts, event_id)),
           |monthly AS (
           |  SELECT month,
           |    CASE WHEN GROUPING(region_id) = 1 THEN 'overall' ELSE region_id END AS region_id,
           |    CAST(count(*) AS BIGINT) AS passenger_trips_num,
           |    CAST(SUM(CASE WHEN leg_id = 1 THEN 1 ELSE 0 END) AS BIGINT) AS journey_num,
           |    CAST(SUM(CASE WHEN leg_id != 1 THEN 1 ELSE 0 END) AS BIGINT) AS transfer_num,
           |    CAST(SUM(dist_cm) AS BIGINT) AS dist_cm_sum,
           |    CAST(SUM(end_us - start_us) AS BIGINT) AS travel_time_us,
           |    CAST(SUM(CASE WHEN next_start_us IS NULL THEN 0
           |                  WHEN next_start_us - end_us < 0
           |                    OR next_start_us - end_us > 14400000000 THEN 0
           |                  ELSE next_start_us - end_us END) AS BIGINT)
           |      AS transfer_time_us
           |  FROM wt2
           |  GROUP BY GROUPING SETS ((month, region_id), (month))),
           |daily AS (
           |  SELECT day,
           |    CASE WHEN GROUPING(region_id) = 1 THEN 'overall' ELSE region_id END AS region_id,
           |    count(*) AS trip_count,
           |    COUNT(DISTINCT user_id) AS n_users
           |  FROM wt2
           |  GROUP BY GROUPING SETS ((day, region_id), (day))),
           |avg_daily AS (
           |  SELECT substr(day, 1, 7) AS month, region_id,
           |    CAST((2*SUM(CASE WHEN n_users > 0
           |                THEN (2000000*trip_count + n_users) // (2*n_users)
           |                ELSE 0 END)
           |          + 100*MAX(date_part('day', last_day(CAST(day AS DATE)))))
           |         // (200*MAX(date_part('day', last_day(CAST(day AS DATE)))))
           |         AS DOUBLE) / 10000.0 AS avg_daily_trips_per_passenger
           |  FROM daily GROUP BY 1, 2),
           |audit AS (
           |  SELECT strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS audit_ts FROM events)
           |SELECT m.month AS t_date, 'month' AS date_type, m.region_id,
           |  m.transfer_num, m.journey_num, m.passenger_trips_num,
           |  CAST((2*m.dist_cm_sum + 1000) // 2000 AS DOUBLE) / 100.0
           |    AS travel_distance,
           |  CAST((2*m.travel_time_us + 600000) // 1200000 AS DOUBLE) / 100.0
           |    AS travel_time,
           |  CAST((2*m.transfer_time_us + 600000) // 1200000 AS DOUBLE) / 100.0
           |    AS transfer_time,
           |  a.avg_daily_trips_per_passenger,
           |  CASE WHEN m.passenger_trips_num > 0
           |       THEN CAST((2*m.travel_time_us + 6000*m.passenger_trips_num)
           |                 // (12000*m.passenger_trips_num) AS DOUBLE) / 10000.0
           |       ELSE 0 END AS avg_travel_time_by_trips,
           |  CASE WHEN m.journey_num > 0
           |       THEN CAST((2*m.travel_time_us + 6000*m.journey_num)
           |                 // (12000*m.journey_num) AS DOUBLE) / 10000.0
           |       ELSE 0 END AS avg_travel_time_by_journey,
           |  CASE WHEN m.passenger_trips_num > 0
           |       THEN CAST((2*m.dist_cm_sum + 10*m.passenger_trips_num)
           |                 // (20*m.passenger_trips_num) AS DOUBLE) / 10000.0
           |       ELSE 0 END AS avg_travel_distance_by_trips,
           |  CASE WHEN m.journey_num > 0
           |       THEN CAST((2*m.dist_cm_sum + 10*m.journey_num)
           |                 // (20*m.journey_num) AS DOUBLE) / 10000.0
           |       ELSE 0 END AS avg_travel_distance_by_journey,
           |  'system' AS create_by, 'system' AS update_by,
           |  au.audit_ts AS create_time, au.audit_ts AS update_time
           |FROM monthly m
           |JOIN avg_daily a ON m.month = a.month AND m.region_id = a.region_id
           |CROSS JOIN audit au
           |ORDER BY 1, 3""".stripMargin))

  /** EP3 `dwd_bus_route_info_mf` VDV-network + geometry flow — see
    * [[graft.pipelines.RouteInfo.dwdBusRouteInfo]]. */
  val q38 = QueryDef(
    "q38_route_network_geometry",
    (s, dir) => RouteInfo.dwdBusRouteInfo(s, dir),
    Some("""WITH stops AS (
           |  SELECT p_partkey AS point_no,
           |    1 + p_partkey % 2 AS point_type,
           |    (54 + p_partkey % 3) * 10000000 + (p_partkey * 7 % 60) * 100000
           |      + (p_partkey * 13 % 60) * 1000 + p_partkey % 1000 AS lon_dms,
           |    (23 + p_partkey % 2) * 10000000 + (p_partkey * 11 % 60) * 100000
           |      + (p_partkey * 17 % 60) * 1000 + p_partkey % 997 AS lat_dms,
           |    p_name AS stop_desc
           |  FROM part),
           |route_seq AS (
           |  SELECT l_orderkey AS line_no, 'R' AS route_abbr,
           |    row_number() OVER (PARTITION BY l_orderkey
           |                       ORDER BY l_linenumber, l_partkey) AS sequence_no,
           |    l_partkey AS point_no,
           |    1 + l_partkey % 2 AS point_type
           |  FROM lineitem
           |  WHERE l_orderkey < (SELECT min(l_orderkey) + 400 FROM lineitem)),
           |processed AS (
           |  SELECT * FROM (
           |    SELECT rs.*,
           |      lead(point_no) OVER w AS to_point_no,
           |      lead(point_type) OVER w AS to_point_type
           |    FROM route_seq rs
           |    WINDOW w AS (PARTITION BY line_no, route_abbr ORDER BY sequence_no))
           |  WHERE to_point_no IS NOT NULL),
           |link AS (
           |  SELECT DISTINCT point_type, point_no, to_point_no, to_point_type
           |  FROM processed),
           |link2 AS (
           |  SELECT *, (point_no * 7 + to_point_no * 3) % 5000 AS link_distance
           |  FROM link),
           |link_pts AS (
           |  SELECT point_type, point_no, to_point_no, to_point_type,
           |    1 AS serial, point_no AS stop_no, point_type AS stop_type FROM link
           |  UNION ALL
           |  SELECT point_type, point_no, to_point_no, to_point_type,
           |    2, to_point_no, to_point_type FROM link),
           |with_coords AS (
           |  SELECT * FROM (
           |    SELECT lp.*,
           |      (((s.lon_dms // 10000000) * 3600000000
           |        + ((s.lon_dms // 100000) % 100) * 60000000
           |        + ((s.lon_dms // 1000) % 100) * 1000000
           |        + (s.lon_dms % 1000) * 1000) + 1800) // 3600 AS lon_micro,
           |      (((s.lat_dms // 10000000) * 3600000000
           |        + ((s.lat_dms // 100000) % 100) * 60000000
           |        + ((s.lat_dms // 1000) % 100) * 1000000
           |        + (s.lat_dms % 1000) * 1000) + 1800) // 3600 AS lat_micro
           |    FROM link_pts lp
           |    LEFT JOIN stops s
           |      ON lp.stop_no = s.point_no AND lp.stop_type = s.point_type)
           |  WHERE lon_micro IS NOT NULL),
           |link_geom AS (
           |  SELECT point_type, point_no, to_point_no, to_point_type,
           |    'LINESTRING (' ||
           |      string_agg(
           |        printf('%d.%06d', lon_micro // 1000000, lon_micro % 1000000)
           |          || ' ' ||
           |        printf('%d.%06d', lat_micro // 1000000, lat_micro % 1000000),
           |        ', ' ORDER BY serial) || ')' AS wkt
           |  FROM with_coords
           |  GROUP BY 1, 2, 3, 4),
           |route_lengths AS (
           |  SELECT p.line_no, p.route_abbr,
           |    CAST(SUM(COALESCE(l.link_distance, 0)) AS BIGINT) AS route_length_m
           |  FROM processed p
           |  LEFT JOIN link2 l
           |    USING (point_type, point_no, to_point_no, to_point_type)
           |  GROUP BY 1, 2),
           |first_last AS (
           |  SELECT line_no, route_abbr,
           |    arg_min(point_no, sequence_no) AS first_stop_no,
           |    arg_max(point_no, sequence_no) AS last_stop_no
           |  FROM route_seq GROUP BY 1, 2),
           |named AS (
           |  SELECT fl.*, s1.stop_desc AS from_stop_name, s2.stop_desc AS to_stop_name
           |  FROM first_last fl
           |  LEFT JOIN stops s1 ON fl.first_stop_no = s1.point_no
           |  LEFT JOIN stops s2 ON fl.last_stop_no = s2.point_no),
           |shapes AS (
           |  SELECT p.line_no, p.route_abbr,
           |    CAST(count(*) AS BIGINT) AS n_links,
           |    string_agg(g.wkt, '; ' ORDER BY p.sequence_no) AS geometry
           |  FROM processed p
           |  LEFT JOIN link_geom g
           |    USING (point_type, point_no, to_point_no, to_point_type)
           |  GROUP BY 1, 2)
           |SELECT s.line_no, s.route_abbr AS route_no, s.n_links,
           |  r.route_length_m, n.first_stop_no, n.last_stop_no,
           |  n.from_stop_name, n.to_stop_name, s.geometry
           |FROM shapes s
           |JOIN route_lengths r ON s.line_no = r.line_no AND s.route_abbr = r.route_abbr
           |JOIN named n ON s.line_no = n.line_no AND s.route_abbr = n.route_abbr
           |ORDER BY 1, 2""".stripMargin))

  /** EP3 `ads_passenger_travel_time_di` — see
    * [[graft.pipelines.TravelTime.adsTravelTimeDaily]]. */
  val q40 = QueryDef(
    "q40_ads_travel_time_pipeline",
    (s, dir) => TravelTime.adsTravelTimeDaily(s, dir),
    Some("""WITH line AS (
           |  SELECT line_clean, min(line_abbr) AS line_abbr,
           |    length(min(line_abbr)) % 6 AS op_dep_no
           |  FROM (SELECT DISTINCT event_type AS line_abbr,
           |          upper(regexp_replace(trim(event_type), '[^A-Za-z0-9]', '', 'g')) AS line_clean
           |        FROM events)
           |  GROUP BY line_clean),
           |legs0 AS (
           |  SELECT e.user_id, e.event_id, e.ts, e.value,
           |    COALESCE(r.r_name, 'Unknown') AS region_id,
           |    strftime(e.ts, '%Y-%m-%d') AS day,
           |    CAST(round(e.value * 60000000) AS BIGINT) AS travel_us,
           |    CASE WHEN e.value IS NULL THEN 'NA'
           |         WHEN e.value <= 10 THEN '0-10min'
           |         WHEN e.value <= 20 THEN '10-20min'
           |         WHEN e.value <= 30 THEN '20-30min'
           |         WHEN e.value <= 40 THEN '30-40min'
           |         WHEN e.value <= 50 THEN '40-50min'
           |         WHEN e.value <= 60 THEN '50-60min'
           |         WHEN e.value <= 90 THEN '60-90min'
           |         WHEN e.value <= 120 THEN '90-120min'
           |         ELSE '>120min' END AS time_range_type
           |  FROM events e
           |  LEFT JOIN line l
           |    ON upper(regexp_replace(trim(e.event_type), '[^A-Za-z0-9]', '', 'g')) = l.line_clean
           |  LEFT JOIN region r ON l.op_dep_no = r.r_regionkey),
           |legs AS (
           |  SELECT *,
           |    row_number() OVER (PARTITION BY user_id, day ORDER BY ts, event_id) AS leg_id
           |  FROM legs0),
           |trips AS (
           |  SELECT day AS ope_date, time_range_type, region_id,
           |    CAST(count(*) AS BIGINT) AS passenger_trips_num
           |  FROM legs GROUP BY 1, 2, 3),
           |j0 AS (
           |  SELECT day AS ope_date, user_id, region_id,
           |    CAST(SUM(travel_us) AS BIGINT) AS journey_us
           |  FROM legs GROUP BY 1, 2, 3),
           |journeys AS (
           |  SELECT ope_date,
           |    CASE WHEN journey_us IS NULL THEN 'NA'
           |         WHEN journey_us <= 600000000 THEN '0-10min'
           |         WHEN journey_us <= 1200000000 THEN '10-20min'
           |         WHEN journey_us <= 1800000000 THEN '20-30min'
           |         WHEN journey_us <= 2400000000 THEN '30-40min'
           |         WHEN journey_us <= 3000000000 THEN '40-50min'
           |         WHEN journey_us <= 3600000000 THEN '50-60min'
           |         WHEN journey_us <= 5400000000 THEN '60-90min'
           |         WHEN journey_us <= 7200000000 THEN '90-120min'
           |         ELSE '>120min' END AS time_range_type,
           |    region_id, CAST(count(*) AS BIGINT) AS journey_num
           |  FROM j0 GROUP BY 1, 2, 3),
           |transfers AS (
           |  SELECT day AS ope_date, time_range_type, region_id,
           |    CAST(count(*) AS BIGINT) AS transfer_num
           |  FROM legs WHERE leg_id > 1 GROUP BY 1, 2, 3),
           |joined AS (
           |  SELECT * FROM trips
           |  FULL JOIN journeys USING (ope_date, time_range_type, region_id)
           |  FULL JOIN transfers USING (ope_date, time_range_type, region_id)),
           |overall AS (
           |  SELECT ope_date, time_range_type, 'Overall' AS region_id,
           |    CAST(COALESCE(SUM(passenger_trips_num), 0) AS BIGINT) AS passenger_trips_num,
           |    CAST(COALESCE(SUM(journey_num), 0) AS BIGINT) AS journey_num,
           |    CAST(COALESCE(SUM(transfer_num), 0) AS BIGINT) AS transfer_num
           |  FROM joined GROUP BY 1, 2)
           |SELECT * FROM (
           |  SELECT ope_date, time_range_type, region_id,
           |    passenger_trips_num, journey_num, transfer_num
           |  FROM joined
           |  UNION ALL SELECT * FROM overall)
           |ORDER BY 1, 2, 3""".stripMargin))

  /** EP2 `ads_passenger_transfer_count_di` — see
    * [[graft.pipelines.TransferCount.adsTransferCountDaily]]. */
  val q41 = QueryDef(
    "q41_ads_transfer_count_pipeline",
    (s, dir) => TransferCount.adsTransferCountDaily(s, dir),
    Some("""WITH line AS (
           |  SELECT line_clean, min(line_abbr) AS line_abbr,
           |    length(min(line_abbr)) % 6 AS op_dep_no
           |  FROM (SELECT DISTINCT event_type AS line_abbr,
           |          upper(regexp_replace(trim(event_type), '[^A-Za-z0-9]', '', 'g')) AS line_clean
           |        FROM events)
           |  GROUP BY line_clean),
           |legs AS (
           |  SELECT user_id, region_id, t_date,
           |    row_number() OVER (PARTITION BY user_id, t_date
           |                       ORDER BY ts, event_id) AS leg_id
           |  FROM (SELECT e.user_id, r.r_name AS region_id,
           |          strftime(e.ts, '%Y-%m-%d') AS t_date, e.ts, e.event_id
           |        FROM events e
           |        LEFT JOIN line l
           |          ON upper(regexp_replace(trim(e.event_type), '[^A-Za-z0-9]', '', 'g')) = l.line_clean
           |        LEFT JOIN region r ON l.op_dep_no = r.r_regionkey)
           |  WHERE region_id IS NOT NULL),
           |hist AS (
           |  SELECT t_date, CAST(leg_id AS BIGINT) AS leg_id,
           |    CASE WHEN GROUPING(region_id) = 1 THEN 'overall' ELSE region_id END AS region_id,
           |    CAST(count(*) AS BIGINT) AS cnt
           |  FROM legs
           |  GROUP BY GROUPING SETS ((t_date, leg_id, region_id), (t_date, leg_id))),
           |spine AS (
           |  SELECT t_date, region_id,
           |    unnest(range(0, CAST(greatest(6, max(leg_id)) - 1 AS BIGINT))) AS transfer_cnt_type
           |  FROM hist GROUP BY t_date, region_id),
           |audit AS (
           |  SELECT strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS audit_ts FROM events)
           |SELECT s.t_date, 'day' AS date_type, s.region_id,
           |  CAST(s.transfer_cnt_type AS INTEGER) AS transfer_cnt_type,
           |  COALESCE(h1.cnt, 0) - COALESCE(h2.cnt, 0) AS journey_num,
           |  'system' AS create_by, 'system' AS update_by,
           |  au.audit_ts AS create_time, au.audit_ts AS update_time
           |FROM spine s
           |LEFT JOIN hist h1 ON s.t_date = h1.t_date AND s.region_id = h1.region_id
           |  AND h1.leg_id = s.transfer_cnt_type + 1
           |LEFT JOIN hist h2 ON s.t_date = h2.t_date AND s.region_id = h2.region_id
           |  AND h2.leg_id = s.transfer_cnt_type + 2
           |CROSS JOIN audit au
           |WHERE COALESCE(h1.cnt, 0) - COALESCE(h2.cnt, 0) >= 0
           |ORDER BY 1, 3, 4""".stripMargin))

  /** EP2 `ads_stop_passenger_trips_di` — see
    * [[graft.pipelines.StopTrips.adsStopTripsDaily]]. */
  val q42 = QueryDef(
    "q42_ads_stop_trips_pipeline",
    (s, dir) => StopTrips.adsStopTripsDaily(s, dir),
    Some("""WITH ev AS (
           |  SELECT *, strftime(ts, '%Y-%m-%d') AS dt,
           |    event_id % 50 AS start_station_no,
           |    (event_id * 7 + 3) % 50 AS end_station_no
           |  FROM events
           |  WHERE event_id % 50 != 0 AND (event_id * 7 + 3) % 50 != 0),
           |spine AS (
           |  SELECT dt, start_station_no AS station_no FROM ev
           |  UNION
           |  SELECT dt, end_station_no FROM ev),
           |boards AS (
           |  SELECT dt, start_station_no AS station_no,
           |    CAST(count(*) AS BIGINT) AS trip_board_num
           |  FROM ev GROUP BY 1, 2),
           |alights AS (
           |  SELECT dt, end_station_no AS station_no,
           |    CAST(count(*) AS BIGINT) AS trip_alight_num
           |  FROM ev GROUP BY 1, 2),
           |legs AS (
           |  SELECT *, row_number() OVER (PARTITION BY user_id, dt
           |                              ORDER BY ts, event_id) AS leg_id
           |  FROM ev),
           |journey_boards AS (
           |  SELECT dt, start_station_no AS station_no,
           |    CAST(count(*) AS BIGINT) AS journey_board_num
           |  FROM legs WHERE leg_id = 1 GROUP BY 1, 2),
           |last_legs AS (
           |  SELECT * FROM (
           |    SELECT *, row_number() OVER (PARTITION BY user_id, dt
           |                                ORDER BY ts DESC, event_id DESC) AS rn
           |    FROM ev)
           |  WHERE rn = 1),
           |journey_alights AS (
           |  SELECT dt, end_station_no AS station_no,
           |    CAST(count(*) AS BIGINT) AS journey_alight_num
           |  FROM last_legs GROUP BY 1, 2),
           |day_type AS (
           |  SELECT DISTINCT dt,
           |    CASE WHEN isodow(CAST(dt AS DATE)) >= 6
           |         THEN 'weekend' ELSE 'weekday' END AS day_type
           |  FROM ev)
           |SELECT s.station_no AS stop_no, s.dt AS t_date, 'day' AS date_type,
           |  COALESCE(b.trip_board_num, 0) AS trip_board_num,
           |  COALESCE(a.trip_alight_num, 0) AS trip_alight_num,
           |  COALESCE(jb.journey_board_num, 0) AS journey_board_num,
           |  COALESCE(ja.journey_alight_num, 0) AS journey_alight_num,
           |  d.day_type
           |FROM spine s
           |LEFT JOIN boards b ON s.dt = b.dt AND s.station_no = b.station_no
           |LEFT JOIN alights a ON s.dt = a.dt AND s.station_no = a.station_no
           |LEFT JOIN journey_boards jb ON s.dt = jb.dt AND s.station_no = jb.station_no
           |LEFT JOIN journey_alights ja ON s.dt = ja.dt AND s.station_no = ja.station_no
           |LEFT JOIN day_type d ON s.dt = d.dt
           |ORDER BY 2, 1""".stripMargin))

  /** EP2 `ads_ridership_passenger_trips_di` — see
    * [[graft.pipelines.Ridership.adsRidershipDaily]]. */
  val q43 = QueryDef(
    "q43_ads_ridership_pipeline",
    (s, dir) => Ridership.adsRidershipDaily(s, dir),
    Some("""WITH ev AS (
           |  SELECT *, strftime(ts, '%Y-%m-%d') AS t_date, event_type AS route
           |  FROM events),
           |daily AS (
           |  SELECT t_date, route, CAST(count(*) AS BIGINT) AS passenger_trips
           |  FROM ev GROUP BY 1, 2),
           |leg1 AS (
           |  SELECT t_date, route, CAST(count(*) AS BIGINT) AS journey_trips
           |  FROM (SELECT *, row_number() OVER (PARTITION BY user_id, t_date
           |                                     ORDER BY ts, event_id) AS leg_id
           |        FROM ev)
           |  WHERE leg_id = 1 GROUP BY 1, 2),
           |dim AS (
           |  SELECT r, region,
           |    ['Link', 'Regional', 'Local'][length(r) % 3 + 1] AS stype
           |  FROM (SELECT DISTINCT event_type AS r FROM events) d
           |  LEFT JOIN (SELECT r_regionkey, r_name AS region FROM region) rg
           |    ON length(d.r) % 6 = rg.r_regionkey),
           |joined AS (
           |  SELECT dly.t_date, dly.route, dly.passenger_trips,
           |    COALESCE(l.journey_trips, 0) AS journey_trips,
           |    CASE WHEN dly.route = 'error' THEN 'ASIA' ELSE dm.region END AS region_fixed,
           |    dm.stype
           |  FROM daily dly
           |  LEFT JOIN leg1 l ON dly.t_date = l.t_date AND dly.route = l.route
           |  LEFT JOIN dim dm ON dly.route = dm.r)
           |SELECT t_date,
           |  CASE WHEN region_fixed IS NULL OR stype IS NULL THEN 'Unknown'
           |       WHEN stype = 'Link' THEN region_fixed || ' Link'
           |       WHEN stype = 'Regional' THEN region_fixed || ' Regional'
           |       ELSE region_fixed || ' Local' END AS service_type,
           |  CAST(COUNT(DISTINCT route) AS BIGINT) AS route_num,
           |  CAST(SUM(passenger_trips) AS BIGINT) AS passenger_trips,
           |  CAST(SUM(journey_trips) AS BIGINT) AS journey_trips
           |FROM joined
           |GROUP BY 1, 2
           |ORDER BY 1, 2""".stripMargin))

  /** Revenue family — `ads_csc_sales_revenue_region_mi`
    * (`scripts/ads_csc_sales_revenue_region_mi.R:26-49`): two-level
    * re-aggregation (A8: month×product sums → month with a conditional
    * CSC sum), substring product test (F4, `grepl('CSC', ...)`), and
    * the reference's LITERAL audit columns (it hardcodes author +
    * timestamp — mirrored with engine literals). Fixture: sales =
    * lineitem×orders (month) ×part (product = p_type; 'BRASS' plays
    * the CSC marker). */
  val q44 = QueryDef(
    "q44_ads_sales_revenue_pipeline",
    (s, dir) => {
      import graft.core.Tables
      val li = Tables.lineitem(s, dir)
      val ord = Tables.orders(s, dir)
        .select(col("o_orderkey"), date_format(col("o_orderdate"), "yyyy-MM").as("v_month"))
      val part = Tables.part(s, dir).select(col("p_partkey"), col("p_type").as("product"))
      // quantity is integral and price is 2-decimal money (both within
      // 1e-9 in the fixture): aggregate in exact integer units so the
      // cross-engine summation-order round-half ties (the q51 class)
      // cannot occur
      val byProduct = li
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(part), col("l_partkey") === col("p_partkey"))
        .groupBy(col("v_month"), col("product"))
        .agg(sum(round(col("l_quantity")).cast("long")).as("sales_quantity"),
             sum(round(col("l_extendedprice") * 100).cast("long"))
               .as("revenue_cents"))
        .withColumn("is_csc", col("product").contains("BRASS"))
      byProduct.groupBy(col("v_month"))
        .agg(
          round(sum(col("sales_quantity")).cast("double"), 2).as("sales_quantity"),
          round(sum(col("revenue_cents")).cast("double") / 100.0, 2)
            .as("sales_revenue"),
          round(sum(when(col("is_csc"), col("sales_quantity")).otherwise(0L))
            .cast("double"), 2).as("contactless_smart_tickets_num"))
        .select(col("v_month").as("t_date"), lit("month").as("date_type"),
          col("sales_quantity"), col("sales_revenue"),
          col("contactless_smart_tickets_num"),
          lit("system").as("create_by"), lit("system").as("update_by"),
          lit("2025-09-01 11:07:58").as("create_time"),
          lit("2025-09-01 11:07:58").as("update_time"))
        .orderBy(col("t_date"))
    },
    Some("""WITH by_product AS (
           |  SELECT strftime(o.o_orderdate, '%Y-%m') AS v_month, p.p_type AS product,
           |    CAST(SUM(CAST(round(l.l_quantity) AS BIGINT)) AS BIGINT)
           |      AS sales_quantity,
           |    CAST(SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
           |      AS revenue_cents,
           |    contains(p.p_type, 'BRASS') AS is_csc
           |  FROM lineitem l
           |  JOIN orders o ON l.l_orderkey = o.o_orderkey
           |  JOIN part p ON l.l_partkey = p.p_partkey
           |  GROUP BY 1, 2, contains(p.p_type, 'BRASS'))
           |SELECT v_month AS t_date, 'month' AS date_type,
           |  ROUND(CAST(SUM(sales_quantity) AS DOUBLE), 2) AS sales_quantity,
           |  ROUND(CAST(SUM(revenue_cents) AS DOUBLE) / 100.0, 2) AS sales_revenue,
           |  ROUND(CAST(SUM(CASE WHEN is_csc THEN sales_quantity ELSE 0 END)
           |    AS DOUBLE), 2) AS contactless_smart_tickets_num,
           |  'system' AS create_by, 'system' AS update_by,
           |  '2025-09-01 11:07:58' AS create_time,
           |  '2025-09-01 11:07:58' AS update_time
           |FROM by_product
           |GROUP BY 1
           |ORDER BY 1""".stripMargin))

  /** EP1-family `ads_passenger_travel_distance_di` — see
    * [[graft.pipelines.TravelDistance.adsTravelDistanceDaily]]. */
  val q45 = QueryDef(
    "q45_ads_travel_distance_pipeline",
    (s, dir) => TravelDistance.adsTravelDistanceDaily(s, dir),
    Some("""WITH line AS (
           |  SELECT line_clean, min(line_abbr) AS line_abbr,
           |    length(min(line_abbr)) % 6 AS op_dep_no
           |  FROM (SELECT DISTINCT event_type AS line_abbr,
           |          upper(regexp_replace(trim(event_type), '[^A-Za-z0-9]', '', 'g')) AS line_clean
           |        FROM events)
           |  GROUP BY line_clean),
           |legs AS (
           |  SELECT user_id, region_id, t_date, ts,
           |    CASE WHEN km IS NULL THEN 'NA'
           |         WHEN km <= 5 THEN '0-5km' WHEN km <= 10 THEN '5-10km'
           |         WHEN km <= 15 THEN '10-15km' WHEN km <= 20 THEN '15-20km'
           |         ELSE '>20km' END AS distance_type,
           |    row_number() OVER (PARTITION BY user_id, t_date
           |                       ORDER BY ts, event_id) AS leg_id
           |  FROM (SELECT e.user_id, r.r_name AS region_id, e.ts, e.event_id,
           |          strftime(e.ts, '%Y-%m-%d') AS t_date,
           |          e.value / 1000.0 AS km
           |        FROM events e
           |        LEFT JOIN line l
           |          ON upper(regexp_replace(trim(e.event_type), '[^A-Za-z0-9]', '', 'g')) = l.line_clean
           |        LEFT JOIN region r ON l.op_dep_no = r.r_regionkey)
           |  WHERE region_id IS NOT NULL),
           |agg_current AS (
           |  SELECT t_date, distance_type,
           |    CASE WHEN GROUPING(region_id) = 1 THEN 'overall' ELSE region_id END AS region_id,
           |    CAST(count(*) AS BIGINT) AS passenger_trips_num,
           |    CAST(SUM(CASE WHEN leg_id = 1 THEN 1 ELSE 0 END) AS BIGINT) AS journey_num,
           |    CAST(SUM(CASE WHEN leg_id != 1 THEN 1 ELSE 0 END) AS BIGINT) AS transfer_num
           |  FROM legs
           |  GROUP BY GROUPING SETS ((t_date, distance_type, region_id),
           |                          (t_date, distance_type))),
           |agg_prior AS (
           |  SELECT t_date, distance_type,
           |    CASE WHEN GROUPING(region_id) = 1 THEN 'overall' ELSE region_id END AS region_id
           |  FROM legs WHERE ts < TIMESTAMP '2024-01-15'
           |  GROUP BY GROUPING SETS ((t_date, distance_type, region_id),
           |                          (t_date, distance_type))),
           |prev_wm AS (
           |  SELECT strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS prev_ts
           |  FROM events WHERE ts < TIMESTAMP '2024-01-15'),
           |now_wm AS (
           |  SELECT strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS now_ts FROM events)
           |SELECT c.t_date, 'day' AS date_type, c.region_id, c.distance_type,
           |  c.transfer_num, c.journey_num, c.passenger_trips_num,
           |  'system' AS create_by, 'system' AS update_by,
           |  CASE WHEN p.t_date IS NOT NULL THEN w.prev_ts ELSE n.now_ts END
           |    AS create_time,
           |  n.now_ts AS update_time
           |FROM agg_current c
           |LEFT JOIN agg_prior p ON c.t_date = p.t_date
           |  AND c.distance_type = p.distance_type AND c.region_id = p.region_id
           |CROSS JOIN prev_wm w
           |CROSS JOIN now_wm n
           |ORDER BY 1, 3, 4""".stripMargin))

  /** EP2-family `ads_route_passenger_trips_di` — see
    * [[graft.pipelines.RouteTrips.adsRouteTripsDaily]]. */
  val q46 = QueryDef(
    "q46_ads_route_trips_pipeline",
    (s, dir) => RouteTrips.adsRouteTripsDaily(s, dir),
    Some("""WITH ev AS (
           |  SELECT ts, event_type AS route,
           |    CAST(event_id % 2 AS INTEGER) AS direction
           |  FROM events),
           |line AS (
           |  SELECT route AS line_abbr,
           |    CAST(dense_rank() OVER (ORDER BY route) AS BIGINT) AS line_no
           |  FROM (SELECT DISTINCT route FROM ev)),
           |sliced AS (
           |  SELECT strftime(ts, '%Y-%m-%d') AS t_date, route, direction,
           |    CAST(count(*) AS BIGINT) AS passenger_trips_num
           |  FROM ev
           |  WHERE EXTRACT(day FROM ts) < 8
           |     OR (EXTRACT(day FROM ts) = 8 AND ts = date_trunc('day', ts))
           |  GROUP BY 1, 2, 3
           |  UNION ALL
           |  SELECT strftime(ts, '%Y-%m-%d'), route, direction,
           |    CAST(count(*) AS BIGINT)
           |  FROM ev
           |  WHERE (EXTRACT(day FROM ts) >= 8 AND EXTRACT(day FROM ts) < 15)
           |     OR (EXTRACT(day FROM ts) = 15 AND ts = date_trunc('day', ts))
           |  GROUP BY 1, 2, 3
           |  UNION ALL
           |  SELECT strftime(ts, '%Y-%m-%d'), route, direction,
           |    CAST(count(*) AS BIGINT)
           |  FROM ev
           |  WHERE (EXTRACT(day FROM ts) >= 15 AND EXTRACT(day FROM ts) < 22)
           |     OR (EXTRACT(day FROM ts) = 22 AND ts = date_trunc('day', ts))
           |  GROUP BY 1, 2, 3
           |  UNION ALL
           |  SELECT strftime(ts, '%Y-%m-%d'), route, direction,
           |    CAST(count(*) AS BIGINT)
           |  FROM ev
           |  WHERE EXTRACT(day FROM ts) >= 22
           |     OR (EXTRACT(day FROM ts) = 1 AND ts = date_trunc('day', ts)
           |         AND date_trunc('month', ts) >
           |             (SELECT min(date_trunc('month', ts)) FROM ev))
           |  GROUP BY 1, 2, 3),
           |wm AS (
           |  SELECT strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS audit_ts FROM events)
           |SELECT l.line_no, '' AS route_no, s.direction, s.t_date,
           |  'day' AS date_type, s.passenger_trips_num,
           |  w.audit_ts AS create_time, 'system' AS create_by,
           |  w.audit_ts AS update_time, 'system' AS update_by
           |FROM sliced s
           |LEFT JOIN line l ON s.route = l.line_abbr
           |CROSS JOIN wm w
           |ORDER BY t_date, line_no, direction, passenger_trips_num""".stripMargin))

  /** Revenue family `ads_fare_revenue_region_mi` (documented schema) —
    * see [[graft.pipelines.FareRevenue.adsFareRevenueMonthly]]. */
  val q47 = QueryDef(
    "q47_ads_fare_revenue_pipeline",
    (s, dir) => FareRevenue.adsFareRevenueMonthly(s, dir),
    Some("""WITH region_d AS (
           |  SELECT r_regionkey, r_name AS region_id FROM region),
           |fares AS (
           |  SELECT o.o_orderkey, strftime(o.o_orderdate, '%Y-%m') AS t_date,
           |    r.region_id,
           |    CAST(round(o.o_totalprice * 100) AS BIGINT) AS fare_cents,
           |    EXTRACT(day FROM last_day(o.o_orderdate)) AS dim_days
           |  FROM orders o JOIN region_d r ON o.o_custkey % 5 = r.r_regionkey),
           |fare_agg AS (
           |  SELECT t_date,
           |    CASE WHEN GROUPING(region_id) = 1 THEN 'Overall' ELSE region_id END
           |      AS region_id,
           |    CAST(SUM(fare_cents) AS BIGINT) AS fare_cents,
           |    CAST(count(*) AS BIGINT) AS passenger_num,
           |    max(dim_days) AS days_in_month
           |  FROM fares
           |  GROUP BY GROUPING SETS ((t_date, region_id), (t_date))),
           |insp AS (
           |  SELECT f.t_date, f.region_id, l.l_orderkey, l.l_returnflag
           |  FROM lineitem l
           |  JOIN fares f ON l.l_orderkey = f.o_orderkey),
           |insp_agg AS (
           |  SELECT t_date,
           |    CASE WHEN GROUPING(region_id) = 1 THEN 'Overall' ELSE region_id END
           |      AS region_id,
           |    CAST(SUM(CASE WHEN l_returnflag != 'N' THEN 1 ELSE 0 END) AS BIGINT)
           |      AS passengers_inspection_num,
           |    CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT)
           |      AS fare_evasion_passenger_num,
           |    CAST(COUNT(DISTINCT CASE WHEN l_returnflag != 'N' THEN l_orderkey END)
           |      AS BIGINT) AS inspected_trips,
           |    CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS total_scheduled_trips,
           |    CAST(SUM(CASE WHEN l_returnflag != 'N' THEN 1 ELSE 0 END) AS BIGINT)
           |      AS actual_inspections_num,
           |    CAST(count(*) AS BIGINT) AS planned_inspections_num
           |  FROM insp
           |  GROUP BY GROUPING SETS ((t_date, region_id), (t_date)))
           |SELECT f.t_date, 'month' AS date_type, f.region_id,
           |  ROUND(CAST(f.fare_cents AS DOUBLE) / 100.0, 2) AS fare_revenue,
           |  CAST((2*f.fare_cents + f.days_in_month) // (2*f.days_in_month)
           |       AS DOUBLE) / 100.0 AS average_daily_revenue,
           |  CAST((2*f.fare_cents + f.passenger_num) // (2*f.passenger_num)
           |       AS DOUBLE) / 100.0 AS average_fare,
           |  COALESCE(i.passengers_inspection_num, 0) AS passengers_inspection_num,
           |  COALESCE(i.fare_evasion_passenger_num, 0) AS fare_evasion_passenger_num,
           |  f.passenger_num,
           |  f.passenger_num + COALESCE(i.fare_evasion_passenger_num, 0)
           |    AS passenger_carried,
           |  CASE WHEN f.passenger_num + COALESCE(i.fare_evasion_passenger_num, 0) > 0
           |    THEN CAST((2*COALESCE(i.passengers_inspection_num, 0)*10000
           |               + (f.passenger_num + COALESCE(i.fare_evasion_passenger_num, 0)))
           |              // (2*(f.passenger_num + COALESCE(i.fare_evasion_passenger_num, 0)))
           |              AS DOUBLE) / 10000.0
           |    ELSE 0 END AS passenger_inspection_ratio,
           |  COALESCE(i.inspected_trips, 0) AS inspected_trips,
           |  COALESCE(i.total_scheduled_trips, 0) AS total_scheduled_trips,
           |  COALESCE(i.actual_inspections_num, 0) AS actual_inspections_num,
           |  COALESCE(i.planned_inspections_num, 0) AS planned_inspections_num,
           |  CASE WHEN f.passenger_num > 0
           |    THEN CAST((2*COALESCE(i.fare_evasion_passenger_num, 0)*10000
           |               + f.passenger_num) // (2*f.passenger_num) AS DOUBLE) / 10000.0
           |    ELSE 0 END AS fare_evasion_ratio,
           |  CASE WHEN COALESCE(i.total_scheduled_trips, 0) > 0
           |    THEN CAST((2*COALESCE(i.inspected_trips, 0)*10000
           |               + i.total_scheduled_trips) // (2*i.total_scheduled_trips)
           |              AS DOUBLE) / 10000.0
           |    ELSE 0 END AS bus_trip_inspection_ratio,
           |  CASE WHEN COALESCE(i.planned_inspections_num, 0) > 0
           |    THEN CAST((2*COALESCE(i.actual_inspections_num, 0)*10000
           |               + i.planned_inspections_num) // (2*i.planned_inspections_num)
           |              AS DOUBLE) / 10000.0
           |    ELSE 0 END AS inspection_plan_adherence_ratio,
           |  'system' AS create_by, 'system' AS update_by,
           |  '2025-09-01 11:07:58' AS create_time,
           |  '2025-09-01 11:07:58' AS update_time
           |FROM fare_agg f
           |LEFT JOIN insp_agg i ON f.t_date = i.t_date AND f.region_id = i.region_id
           |ORDER BY 1, 3""".stripMargin))

  /** Calendar dimension `dim_date_info` — see
    * [[graft.pipelines.DimDate.dimDateInfo]]. */
  val q48 = QueryDef(
    "q48_dim_date_info",
    (s, dir) => DimDate.dimDateInfo(s, dir),
    Some("""WITH span AS (
           |  SELECT CAST(min(ts) AS DATE) AS d0, CAST(max(ts) AS DATE) AS d1,
           |    strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS audit_ts
           |  FROM events),
           |days AS (
           |  SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS d,
           |    audit_ts
           |  FROM span)
           |SELECT strftime(d, '%Y-%m-%d') AS t_date,
           |  CAST(year(d) AS INTEGER) AS t_year,
           |  CAST(month(d) AS INTEGER) AS t_month,
           |  CAST(day(d) AS INTEGER) AS t_day,
           |  CAST(weekofyear(d) AS INTEGER) AS week_id,
           |  CAST(quarter(d) AS INTEGER) AS quarter,
           |  CAST(isodow(d) AS INTEGER) AS week_day,
           |  strftime(d - (isodow(d) - 1) * INTERVAL 1 DAY, '%Y-%m-%d') AS from_date,
           |  strftime(d + (7 - isodow(d)) * INTERVAL 1 DAY, '%Y-%m-%d') AS to_date,
           |  CASE WHEN isodow(d) <= 5 THEN 1 ELSE 0 END AS is_workday,
           |  -99 AS holiday_fid,
           |  'system' AS create_by, 'system' AS update_by,
           |  audit_ts AS create_time, audit_ts AS update_time
           |FROM days ORDER BY t_date""".stripMargin))

  /** `dwd_bus_route_stop_info_mf` — see
    * [[graft.pipelines.StopDims.dwdBusRouteStopInfo]]. */
  val q49 = QueryDef(
    "q49_dwd_route_stop_pipeline",
    (s, dir) => StopDims.dwdBusRouteStopInfo(s, dir),
    Some("""WITH rs AS (
           |  SELECT l_orderkey AS line_no, 'R' AS route_no,
           |    CAST(1 AS BIGINT) AS version,
           |    CAST(l_partkey AS VARCHAR) AS stop_no,
           |    CAST(row_number() OVER (PARTITION BY l_orderkey
           |                            ORDER BY l_linenumber, l_partkey)
           |      AS VARCHAR) AS stop_index
           |  FROM lineitem
           |  WHERE l_orderkey < (SELECT min(l_orderkey) + 400 FROM lineitem)),
           |lkp AS (
           |  SELECT DISTINCT line_no, route_no,
           |    CAST(line_no % 2 AS VARCHAR) AS direction
           |  FROM rs)
           |SELECT rs.route_no, rs.version, rs.stop_no, rs.stop_index,
           |  rs.line_no, lkp.direction,
           |  'system' AS create_by, 'system' AS update_by,
           |  '20250807_11:07:58' AS create_time,
           |  '20250807_11:07:58' AS update_time
           |FROM rs LEFT JOIN lkp USING (line_no, route_no)
           |ORDER BY line_no, route_no, CAST(stop_index AS INTEGER)""".stripMargin))

  /** `dwd_bus_stop_info_mf` — see
    * [[graft.pipelines.StopDims.dwdBusStopInfo]]. */
  val q50 = QueryDef(
    "q50_dwd_stop_info_pipeline",
    (s, dir) => StopDims.dwdBusStopInfo(s, dir),
    Some("""WITH s AS (
           |  SELECT p_partkey AS key, p_name AS stop_name,
           |    (54 + p_partkey % 3) * 10000000 + (p_partkey * 7 % 60) * 100000 +
           |      (p_partkey * 13 % 60) * 1000 + (p_partkey % 997 + 1) AS lon_dms,
           |    (23 + p_partkey % 2) * 10000000 + (p_partkey * 11 % 60) * 100000 +
           |      (p_partkey * 17 % 60) * 1000 + (p_partkey % 991 + 1) AS lat_dms
           |  FROM part),
           |c AS (
           |  SELECT *,
           |    ((lon_dms // 10000000) * 3600000000 +
           |     ((lon_dms // 100000) % 100) * 60000000 +
           |     ((lon_dms // 1000) % 100) * 1000000 +
           |     (lon_dms % 1000) * 1000 + 1800) // 3600 AS lon_u,
           |    ((lat_dms // 10000000) * 3600000000 +
           |     ((lat_dms // 100000) % 100) * 60000000 +
           |     ((lat_dms // 1000) % 100) * 1000000 +
           |     (lat_dms % 1000) * 1000 + 1800) // 3600 AS lat_u
           |  FROM s)
           |SELECT CAST(key AS VARCHAR) AS stop_no, stop_name,
           |  CAST(key % 20 + 5 AS INTEGER) AS bay_size,
           |  CAST(1 + key % 2 AS VARCHAR) AS stop_type,
           |  CAST(NULL AS INTEGER) AS is_afc,
           |  CAST(NULL AS INTEGER) AS bus_shelter,
           |  CAST(NULL AS INTEGER) AS platform_type,
           |  CAST(NULL AS INTEGER) AS active_status,
           |  printf('POINT (%d.%06d %d.%06d)',
           |    lon_u // 1000000, lon_u % 1000000,
           |    lat_u // 1000000, lat_u % 1000000) AS geom,
           |  CASE
           |    WHEN lon_u > 54000000 AND lon_u < 54500000
           |     AND lat_u > 24000000 AND lat_u < 24600000 THEN 'AbuDhabi'
           |    WHEN lon_u > 55500000 AND lon_u < 56000000
           |     AND lat_u > 24000000 AND lat_u < 24500000 THEN 'AlAin'
           |    WHEN lon_u > 52500000 AND lon_u < 54000000
           |     AND lat_u > 23000000 AND lat_u < 24000000 THEN 'AlDhafra'
           |    ELSE NULL END AS region_id,
           |  '202505080912' AS version,
           |  'system' AS create_by, 'system' AS update_by,
           |  '20250807_11:07:58' AS create_time,
           |  '20250807_11:07:58' AS update_time
           |FROM c ORDER BY key""".stripMargin))

  /** Daily-grain `ads_passenger_travel_info_di` — see
    * [[graft.pipelines.TravelInfo.adsTravelInfoDaily]]. */
  val q51 = QueryDef(
    "q51_ads_travel_info_daily",
    (s, dir) => TravelInfo.adsTravelInfoDaily(s, dir),
    Some("""WITH line AS (
           |  SELECT line_clean, min(line_abbr) AS line_abbr,
           |    length(min(line_abbr)) % 6 AS op_dep_no
           |  FROM (SELECT DISTINCT event_type AS line_abbr,
           |          upper(regexp_replace(trim(event_type), '[^A-Za-z0-9]', '', 'g')) AS line_clean
           |        FROM events)
           |  GROUP BY line_clean),
           |legs AS (
           |  SELECT e.user_id, e.event_id, e.ts, e.value,
           |    r.r_name AS region_id,
           |    strftime(e.ts, '%Y-%m-%d') AS day,
           |    epoch_us(e.ts) AS start_us,
           |    epoch_us(e.ts) + CAST(round(e.value * 60000000) AS BIGINT) AS end_us
           |  FROM events e
           |  LEFT JOIN line l
           |    ON upper(regexp_replace(trim(e.event_type), '[^A-Za-z0-9]', '', 'g')) = l.line_clean
           |  LEFT JOIN region r ON l.op_dep_no = r.r_regionkey
           |  WHERE r.r_name IS NOT NULL),
           |wt2 AS (
           |  SELECT *,
           |    CAST(round(value * 100) AS BIGINT) AS dist_cm,
           |    row_number() OVER w AS leg_id,
           |    lead(start_us) OVER w AS next_start_us
           |  FROM legs
           |  WINDOW w AS (PARTITION BY user_id, day ORDER BY ts, event_id)),
           |daily AS (
           |  SELECT day,
           |    CASE WHEN GROUPING(region_id) = 1 THEN 'overall' ELSE region_id END AS region_id,
           |    CAST(count(*) AS BIGINT) AS passenger_trips_num,
           |    CAST(SUM(CASE WHEN leg_id = 1 THEN 1 ELSE 0 END) AS BIGINT) AS journey_num,
           |    CAST(SUM(CASE WHEN leg_id != 1 THEN 1 ELSE 0 END) AS BIGINT) AS transfer_num,
           |    CAST(SUM(dist_cm) AS BIGINT) AS dist_cm_sum,
           |    CAST(SUM(end_us - start_us) AS BIGINT) AS travel_time_us,
           |    CAST(SUM(CASE WHEN next_start_us IS NULL THEN 0
           |                  WHEN next_start_us - end_us < 0
           |                    OR next_start_us - end_us > 14400000000 THEN 0
           |                  ELSE next_start_us - end_us END) AS BIGINT)
           |      AS transfer_time_us
           |  FROM wt2
           |  GROUP BY GROUPING SETS ((day, region_id), (day))),
           |audit AS (
           |  SELECT strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS audit_ts FROM events)
           |SELECT d.day AS t_date, 'day' AS date_type, d.region_id,
           |  d.transfer_num, d.journey_num, d.passenger_trips_num,
           |  CAST((2*d.dist_cm_sum + 1000) // 2000 AS DOUBLE) / 100.0
           |    AS travel_distance,
           |  CAST((2*d.travel_time_us + 600000) // 1200000 AS DOUBLE) / 100.0
           |    AS travel_time,
           |  CAST((2*d.transfer_time_us + 600000) // 1200000 AS DOUBLE) / 100.0
           |    AS transfer_time,
           |  CASE WHEN d.passenger_trips_num > 0
           |       THEN CAST((2*d.travel_time_us + 6000*d.passenger_trips_num)
           |                 // (12000*d.passenger_trips_num) AS DOUBLE) / 10000.0
           |       ELSE 0 END AS avg_travel_time_by_trips,
           |  CASE WHEN d.journey_num > 0
           |       THEN CAST((2*d.travel_time_us + 6000*d.journey_num)
           |                 // (12000*d.journey_num) AS DOUBLE) / 10000.0
           |       ELSE 0 END AS avg_travel_time_by_journey,
           |  CASE WHEN d.passenger_trips_num > 0
           |       THEN CAST((2*d.dist_cm_sum + 10*d.passenger_trips_num)
           |                 // (20*d.passenger_trips_num) AS DOUBLE) / 10000.0
           |       ELSE 0 END AS avg_travel_distance_by_trips,
           |  CASE WHEN d.journey_num > 0
           |       THEN CAST((2*d.dist_cm_sum + 10*d.journey_num)
           |                 // (20*d.journey_num) AS DOUBLE) / 10000.0
           |       ELSE 0 END AS avg_travel_distance_by_journey,
           |  'system' AS create_by, 'system' AS update_by,
           |  au.audit_ts AS create_time, au.audit_ts AS update_time
           |FROM daily d
           |CROSS JOIN audit au
           |ORDER BY 1, 3""".stripMargin))

  /** Revenue family `ads_fare_revenue_service_type_mi` (documented
    * schema, `docs/ads_revenue.xls` rows 34-47) — see
    * [[graft.pipelines.Revenue.adsFareRevenueServiceTypeMonthly]]. */
  val q55 = QueryDef(
    "q55_ads_fare_revenue_service_type",
    (s, dir) => Revenue.adsFareRevenueServiceTypeMonthly(s, dir),
    Some("""WITH region_d AS (
           |  SELECT r_regionkey, r_name AS region_id FROM region),
           |fares AS (
           |  SELECT o.o_orderkey, strftime(o.o_orderdate, '%Y-%m') AS t_date,
           |    r.region_id,
           |    r.region_id || CASE WHEN o.o_orderpriority = '1-URGENT' THEN ' Link'
           |                        WHEN o.o_orderpriority = '2-HIGH' THEN ' Regional'
           |                        ELSE ' Local' END AS service_type,
           |    CAST(round(o.o_totalprice * 100) AS BIGINT) AS fare_cents
           |  FROM orders o JOIN region_d r ON o.o_custkey % 5 = r.r_regionkey),
           |fare_agg AS (
           |  SELECT t_date, region_id, service_type,
           |    CAST(SUM(fare_cents) AS BIGINT) AS fare_cents,
           |    CAST(count(*) AS BIGINT) AS passenger_num
           |  FROM fares GROUP BY 1, 2, 3),
           |fines AS (
           |  SELECT f.t_date, f.region_id, f.service_type,
           |    CAST(SUM(CASE WHEN l.l_returnflag = 'R' AND l.l_linestatus = 'F'
           |      THEN 1 ELSE 0 END) AS BIGINT) AS passenger_fines_issued_num,
           |    CAST(SUM(CASE WHEN l.l_returnflag = 'R' AND l.l_linestatus = 'F'
           |      THEN CAST(round(l.l_quantity) AS BIGINT) * 1000 ELSE 0 END)
           |      AS BIGINT) AS fine_cents,
           |    CAST(SUM(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END)
           |      AS BIGINT) AS fare_evasion_passenger_num
           |  FROM lineitem l JOIN fares f ON l.l_orderkey = f.o_orderkey
           |  GROUP BY 1, 2, 3)
           |SELECT f.t_date, 'month' AS date_type, f.region_id, f.service_type,
           |  ROUND(CAST(f.fare_cents AS DOUBLE) / 100.0, 2) AS fare_revenue,
           |  COALESCE(n.passenger_fines_issued_num, 0) AS passenger_fines_issued_num,
           |  ROUND(CAST(COALESCE(n.fine_cents, 0) AS DOUBLE) / 100.0, 2)
           |    AS fines_issued_amount,
           |  COALESCE(n.fare_evasion_passenger_num, 0) AS fare_evasion_passenger_num,
           |  f.passenger_num,
           |  CASE WHEN f.passenger_num > 0
           |    THEN CAST((2*COALESCE(n.fare_evasion_passenger_num, 0)*10000
           |               + f.passenger_num) // (2*f.passenger_num) AS DOUBLE) / 10000.0
           |    ELSE 0 END AS fare_evasion_ratio,
           |  'system' AS create_by, 'system' AS update_by,
           |  '2025-09-01 11:07:58' AS create_time,
           |  '2025-09-01 11:07:58' AS update_time
           |FROM fare_agg f
           |LEFT JOIN fines n ON f.t_date = n.t_date AND f.region_id = n.region_id
           |  AND f.service_type = n.service_type
           |ORDER BY 1, 3, 4""".stripMargin))

  /** Revenue family `ads_revenue_proportion_product_type_mi` (documented
    * schema, `docs/ads_revenue.xls` rows 48-58) — see
    * [[graft.pipelines.Revenue.adsRevenueProportionProductTypeMonthly]]. */
  val q56 = QueryDef(
    "q56_ads_revenue_proportion_product_type",
    (s, dir) => Revenue.adsRevenueProportionProductTypeMonthly(s, dir),
    Some("""WITH region_d AS (
           |  SELECT r_regionkey, r_name AS region_id FROM region),
           |ord AS (
           |  SELECT o.o_orderkey, strftime(o.o_orderdate, '%Y-%m') AS t_date,
           |    r.region_id
           |  FROM orders o JOIN region_d r ON o.o_custkey % 5 = r.r_regionkey),
           |legs AS (
           |  SELECT ord.t_date, ord.region_id,
           |    CASE l.l_partkey % 7
           |      WHEN 0 THEN 'T-Purse Personalised' WHEN 1 THEN 'Disabled'
           |      WHEN 2 THEN 'Senior' WHEN 3 THEN 'Student'
           |      WHEN 4 THEN 'T-Purse Annonymous' WHEN 5 THEN 'Monthly Pass'
           |      ELSE 'Weekly Pass' END AS product_type,
           |    CAST(round(l.l_quantity) AS BIGINT) AS qty,
           |    CAST(round(l.l_extendedprice * 100) AS BIGINT) AS ext_cents,
           |    CAST(round(l.l_discount * 100) AS BIGINT) AS disc_pct
           |  FROM lineitem l JOIN ord ON l.l_orderkey = ord.o_orderkey)
           |SELECT t_date, 'month' AS date_type, region_id, product_type,
           |  ROUND(CAST(SUM((ext_cents * (100 - disc_pct)) // 100) AS DOUBLE)
           |    / 100.0, 2) AS fare_revenue,
           |  CAST(SUM(qty) AS BIGINT) AS product_sold_num,
           |  ROUND(CAST(SUM(ext_cents) AS DOUBLE) / 100.0, 2)
           |    AS product_sold_revenue,
           |  'system' AS create_by, 'system' AS update_by,
           |  '2025-09-01 11:07:58' AS create_time,
           |  '2025-09-01 11:07:58' AS update_time
           |FROM legs
           |GROUP BY 1, 3, 4
           |ORDER BY 1, 3, 4""".stripMargin))

  /** Revenue family `ads_revenue_route_mi` (documented schema,
    * `docs/ads_revenue.xls` rows 59-75) — see
    * [[graft.pipelines.Revenue.adsRevenueRouteMonthly]]. */
  val q57 = QueryDef(
    "q57_ads_revenue_route",
    (s, dir) => Revenue.adsRevenueRouteMonthly(s, dir),
    Some("""WITH ev AS (
           |  SELECT strftime(ts, '%Y-%m') AS t_date, event_type AS route,
           |    CAST(event_id % 2 + 1 AS INTEGER) AS direction,
           |    event_id % 491 + 10 AS fare_cents,
           |    CAST(abs(COALESCE(round(value), 0)) AS BIGINT) AS meters,
           |    EXTRACT(day FROM last_day(ts)) AS dim
           |  FROM events),
           |line AS (
           |  SELECT route,
           |    CAST(dense_rank() OVER (ORDER BY route) AS INTEGER) AS line_no,
           |    CAST(length(route) % 5 + 1 AS INTEGER) AS route_no
           |  FROM (SELECT DISTINCT route FROM ev)),
           |g AS (
           |  SELECT t_date, route, direction,
           |    CAST(SUM(fare_cents) AS BIGINT) AS cents,
           |    CAST(count(*) AS BIGINT) AS trips,
           |    CAST(SUM(meters) AS BIGINT) AS meters,
           |    CAST(max(dim) AS BIGINT) AS dim
           |  FROM ev GROUP BY 1, 2, 3),
           |c AS (
           |  SELECT g.*, l.line_no, l.route_no,
           |    trips * 150 AS operation_cents,
           |    (meters * 12) // 1000 AS fuel_cents,
           |    l.line_no * 2500 AS maintenance_cents
           |  FROM g JOIN line l ON g.route = l.route)
           |SELECT t_date, 'month' AS date_type, line_no, route_no, direction,
           |  ROUND(CAST(cents AS DOUBLE) / 100.0, 2) AS fare_revenue,
           |  CAST((2*cents + dim) // (2*dim) AS DOUBLE) / 100.0
           |    AS avg_daily_fare_revenue,
           |  CAST(cents - (operation_cents + fuel_cents + maintenance_cents)
           |    AS BIGINT) AS profitability,
           |  CAST((2*cents + trips) // (2*trips) AS DOUBLE) / 100.0
           |    AS avg_fare_per_trip,
           |  ROUND(CAST(operation_cents + fuel_cents + maintenance_cents
           |    AS DOUBLE) / 100.0, 2) AS total_cost,
           |  ROUND(CAST(operation_cents AS DOUBLE) / 100.0, 2) AS operation_cost,
           |  ROUND(CAST(fuel_cents AS DOUBLE) / 100.0, 2) AS fuel_cost,
           |  ROUND(CAST(maintenance_cents AS DOUBLE) / 100.0, 2) AS maintenance_cost,
           |  'system' AS create_by, 'system' AS update_by,
           |  '2025-09-01 11:07:58' AS create_time,
           |  '2025-09-01 11:07:58' AS update_time
           |FROM c
           |ORDER BY 1, 3, 5""".stripMargin))

  val all: Seq[QueryDef] =
    Seq(q38, q39, q40, q41, q42, q43, q44, q45, q46, q47, q48, q49, q50, q51,
      q55, q56, q57)
}
