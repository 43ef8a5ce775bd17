package graft.queries

import graft.QueryDef
import graft.pipelines.TravelInfo

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
           |  SELECT line_abbr, line_clean, length(line_abbr) % 6 AS op_dep_no
           |  FROM (SELECT DISTINCT event_type AS line_abbr,
           |          upper(regexp_replace(trim(event_type), '[^A-Za-z0-9]', '', 'g')) AS line_clean
           |        FROM events)),
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
           |wt AS (
           |  SELECT *,
           |    value / 1000.0 AS distance_km,
           |    CAST(end_us - start_us AS DOUBLE) / 60000000.0 AS trip_time_min,
           |    row_number() OVER w AS leg_id,
           |    lead(start_us) OVER w AS next_start_us
           |  FROM legs
           |  WINDOW w AS (PARTITION BY user_id, day ORDER BY ts, event_id)),
           |wt2 AS (
           |  SELECT *,
           |    CASE WHEN next_start_us IS NULL THEN 0.0
           |         WHEN next_start_us - end_us < 0
           |           OR next_start_us - end_us > 14400000000 THEN 0.0
           |         ELSE CAST(next_start_us - end_us AS DOUBLE) / 60000000.0
           |    END AS transfer_min
           |  FROM wt),
           |monthly AS (
           |  SELECT month,
           |    CASE WHEN GROUPING(region_id) = 1 THEN 'overall' ELSE region_id END AS region_id,
           |    CAST(count(*) AS BIGINT) AS passenger_trips_num,
           |    CAST(SUM(CASE WHEN leg_id = 1 THEN 1 ELSE 0 END) AS BIGINT) AS journey_num,
           |    CAST(SUM(CASE WHEN leg_id != 1 THEN 1 ELSE 0 END) AS BIGINT) AS transfer_num,
           |    SUM(distance_km) AS travel_distance_raw,
           |    SUM(trip_time_min) AS travel_time_raw,
           |    SUM(transfer_min) AS transfer_time_raw
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
           |    ROUND(SUM(CASE WHEN n_users > 0
           |                   THEN CAST(trip_count AS DOUBLE) / n_users ELSE 0 END)
           |          / MAX(date_part('day', last_day(CAST(day AS DATE)))),
           |          4) AS avg_daily_trips_per_passenger
           |  FROM daily GROUP BY 1, 2),
           |audit AS (
           |  SELECT strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS audit_ts FROM events)
           |SELECT m.month AS t_date, 'month' AS date_type, m.region_id,
           |  m.transfer_num, m.journey_num, m.passenger_trips_num,
           |  ROUND(m.travel_distance_raw, 2) AS travel_distance,
           |  ROUND(m.travel_time_raw, 2) AS travel_time,
           |  ROUND(m.transfer_time_raw, 2) AS transfer_time,
           |  a.avg_daily_trips_per_passenger,
           |  ROUND(CASE WHEN m.passenger_trips_num > 0
           |             THEN m.travel_time_raw / m.passenger_trips_num ELSE 0 END, 4)
           |    AS avg_travel_time_by_trips,
           |  ROUND(CASE WHEN m.journey_num > 0
           |             THEN m.travel_time_raw / m.journey_num ELSE 0 END, 4)
           |    AS avg_travel_time_by_journey,
           |  ROUND(CASE WHEN m.passenger_trips_num > 0
           |             THEN m.travel_distance_raw / m.passenger_trips_num ELSE 0 END, 4)
           |    AS avg_travel_distance_by_trips,
           |  ROUND(CASE WHEN m.journey_num > 0
           |             THEN m.travel_distance_raw / m.journey_num ELSE 0 END, 4)
           |    AS avg_travel_distance_by_journey,
           |  'system' AS create_by, 'system' AS update_by,
           |  au.audit_ts AS create_time, au.audit_ts AS update_time
           |FROM monthly m
           |JOIN avg_daily a ON m.month = a.month AND m.region_id = a.region_id
           |CROSS JOIN audit au
           |ORDER BY 1, 3""".stripMargin))

  val all: Seq[QueryDef] = Seq(q39)
}
