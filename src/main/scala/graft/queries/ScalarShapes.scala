package graft.queries

import graft.QueryDef
import graft.core.Tables
import graft.functions.DmsToDecimalDegrees.dmsToDecimalDegrees
import graft.ops.{Cleaning, Rollups, TimeOps}
import org.apache.spark.sql.functions._

/** Scalar-function surface (SURVEY.md §2.8), overall-rollup A9,
  * two-level re-aggregation A8, first/last-per-ordered-group A14, and
  * the first-seen-timestamp audit pattern S17/ST4 — all with DuckDB
  * oracle twins.
  */
object ScalarShapes {

  /** F1+F7+F18 — deep_clean key normalization and include-lowest upper
    * -bound binning (`scripts/ads_passenger_travel_info_mi.py:145-148`,
    * `scripts/ads_passenger_travel_distance_di.py:210-220`). Pure
    * codegen'd expression chains — no UDFs (SURVEY.md §2.10). */
  val q16 = QueryDef(
    "q16_clean_and_bin",
    (s, dir) => {
      val p = Tables.part(s, dir)
      p.select(
          col("p_partkey"),
          Cleaning.deepClean(col("p_name")).as("clean_name"),
          TimeOps.binByUpperBounds(col("p_retailprice"),
            Seq(1000.0, 1500.0, 2000.0),
            Seq("0-1000", "1000-1500", "1500-2000", ">2000")).as("price_bin"))
        .orderBy(col("p_partkey"))
    },
    Some("""SELECT p_partkey,
           |  upper(regexp_replace(trim(p_name), '[^A-Za-z0-9]', '', 'g')) AS clean_name,
           |  CASE WHEN p_retailprice IS NULL THEN 'NA'
           |       WHEN p_retailprice <= 1000 THEN '0-1000'
           |       WHEN p_retailprice <= 1500 THEN '1000-1500'
           |       WHEN p_retailprice <= 2000 THEN '1500-2000'
           |       ELSE '>2000' END AS price_bin
           |FROM part
           |ORDER BY p_partkey""".stripMargin))

  /** F9-F14 — calendar derivations: date, year-month period, month end,
    * days-in-month, quarter-month slice
    * (`scripts/ads_passenger_travel_info_mi.py:239,346-361`,
    * `...route...py:59-76`). */
  val q17 = QueryDef(
    "q17_calendar_derivations",
    (s, dir) => {
      val o = Tables.orders(s, dir)
      o.select(
          col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("day"),
          TimeOps.yearMonth(col("o_orderdate")).as("year_month"),
          date_format(last_day(col("o_orderdate")), "yyyy-MM-dd").as("month_end"),
          TimeOps.daysInMonth(col("o_orderdate")).as("days_in_month"),
          TimeOps.quarterMonthPart(col("o_orderdate")).as("quarter_month"))
        .orderBy(col("o_orderkey"))
    },
    Some("""SELECT o_orderkey,
           |  strftime(o_orderdate, '%Y-%m-%d') AS day,
           |  strftime(o_orderdate, '%Y-%m') AS year_month,
           |  strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end,
           |  CAST(date_part('day', last_day(CAST(o_orderdate AS DATE))) AS INTEGER)
           |    AS days_in_month,
           |  CASE WHEN date_part('day', o_orderdate) < 8 THEN 1
           |       WHEN date_part('day', o_orderdate) < 15 THEN 2
           |       WHEN date_part('day', o_orderdate) < 22 THEN 3
           |       ELSE 4 END AS quarter_month
           |FROM orders
           |ORDER BY o_orderkey""".stripMargin))

  /** F22 — the custom Catalyst expression [[DmsToDecimalDegrees]]
    * (codegen'd arithmetic, no UDF) against a plain-SQL arithmetic
    * oracle. DMS inputs synthesized deterministically from supplier
    * keys; both positive (N/E) and negative (S/W) paths exercised. */
  val q18 = QueryDef(
    "q18_dms_to_decimal",
    (s, dir) => {
      val sup = Tables.supplier(s, dir)
      sup.select(
          col("s_suppkey"),
          (lit(541234567L) + col("s_suppkey") * lit(1013L)).as("dms_lon"),
          (lit(-243052999L) - col("s_suppkey") * lit(977L)).as("dms_lat"))
        .select(
          col("s_suppkey"),
          dmsToDecimalDegrees(col("dms_lon")).as("lon_deg"),
          dmsToDecimalDegrees(col("dms_lat")).as("lat_deg"))
        .orderBy(col("s_suppkey"))
    },
    Some("""WITH src AS (
           |  SELECT s_suppkey,
           |         541234567 + s_suppkey * 1013 AS lon,
           |         -243052999 - s_suppkey * 977 AS lat
           |  FROM supplier),
           |conv AS (
           |  SELECT s_suppkey, lon, lat,
           |         abs(lon) AS xlon, abs(lat) AS xlat FROM src)
           |SELECT s_suppkey,
           |  (CASE WHEN lon < 0 THEN -1 ELSE 1 END) * ROUND(
           |    (xlon // 10000000) + ((xlon // 100000) % 100) / 60.0 +
           |    (((xlon // 1000) % 100) + (xlon % 1000) / 1000.0) / 3600.0, 6) AS lon_deg,
           |  (CASE WHEN lat < 0 THEN -1 ELSE 1 END) * ROUND(
           |    (xlat // 10000000) + ((xlat // 100000) % 100) / 60.0 +
           |    (((xlat // 1000) % 100) + (xlat % 1000) / 1000.0) / 3600.0, 6) AS lat_deg
           |FROM conv
           |ORDER BY s_suppkey""".stripMargin))

  /** A14 — first/last element of an ordered group without a window:
    * `min_by`/`max_by` (the reference's arrange → first()/last(),
    * `dwd_bus_route_info_mf & other 2.R:185-192`). */
  val q19 = QueryDef(
    "q19_min_max_by",
    (s, dir) => {
      val c = Tables.customer(s, dir)
      c.groupBy(col("c_nationkey"))
        .agg(
          min_by(col("c_name"), col("c_custkey")).as("first_customer"),
          max_by(col("c_name"), col("c_custkey")).as("last_customer"),
          count(lit(1)).as("n"))
        .orderBy(col("c_nationkey"))
    },
    Some("""SELECT c_nationkey,
           |  min_by(c_name, c_custkey) AS first_customer,
           |  max_by(c_name, c_custkey) AS last_customer,
           |  CAST(count(*) AS BIGINT) AS n
           |FROM customer
           |GROUP BY c_nationkey
           |ORDER BY c_nationkey""".stripMargin))

  /** A8 — two-level re-aggregation: per-order line rollup joined back to
    * the order dim, re-aggregated per priority
    * (`ads_csc_sales_revenue_region_mi.R:29-42`). */
  val q20 = QueryDef(
    "q20_two_level_agg",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
      val o = Tables.orders(s, dir)
      // both levels in exact integer centi-units (quantity is 2-decimal
      // by data contract): double sums/avgs are order-dependent in the
      // last bit, flipping round-half ties cross-engine; the final avg
      // is one integral divide (cents_sum/(100·n) · 10^2 = cents_sum/n)
      val perOrder = li.groupBy(col("l_orderkey"))
        .agg(sum(round(col("l_quantity") * 100).cast("long")).as("qty_cents"))
      o.join(perOrder, o("o_orderkey") === perOrder("l_orderkey"), "inner")
        .groupBy(col("o_orderpriority"))
        .agg(
          count(lit(1)).as("n_orders"),
          Cleaning.roundHalfUpRatio(sum(col("qty_cents")), count(lit(1)), 2)
            .as("avg_order_qty"))
        .orderBy(col("o_orderpriority"))
    },
    Some("""WITH per_order AS (
           |  SELECT l_orderkey,
           |         SUM(CAST(round(l_quantity*100) AS BIGINT)) AS qty_cents
           |  FROM lineitem GROUP BY l_orderkey)
           |SELECT o_orderpriority,
           |  CAST(count(*) AS BIGINT) AS n_orders,
           |  CAST((2*SUM(qty_cents) + count(*)) // (2*count(*)) AS DOUBLE) / 100.0
           |    AS avg_order_qty
           |FROM orders JOIN per_order ON o_orderkey = l_orderkey
           |GROUP BY o_orderpriority
           |ORDER BY o_orderpriority""".stripMargin))

  /** S17+ST4 — first-seen-timestamp preservation: left join the current
    * batch against the prior snapshot, `coalesce(prev, current)`
    * (`scripts/ads_passenger_travel_distance_di.py:11-52`'s SQLite
    * get-or-create, restated as a distributed join — no driver-side
    * key-value store). Snapshot = a 5000-event window anchored at
    * min(event_id) (Tables.minId — id-translation-safe, so the
    * big-id offset gate exercises the prev side instead of silently
    * degenerating to all-is_new=1 on BOTH engines). */
  val q21 = QueryDef(
    "q21_first_seen_audit",
    (s, dir) => {
      val ev = Tables.events(s, dir)
      val prev = ev.where(
          col("event_id") < Tables.minId(ev, "event_id") + 5000L)
        .groupBy(col("user_id"))
        .agg(min(unix_micros(col("ts"))).as("prev_first_us"))
      val cur = ev.groupBy(col("user_id"))
        .agg(min(unix_micros(col("ts"))).as("cur_first_us"))
      cur.join(prev, Seq("user_id"), "left")
        .select(
          col("user_id"),
          coalesce(col("prev_first_us"), col("cur_first_us")).as("first_seen_us"),
          when(col("prev_first_us").isNull, 1).otherwise(0).as("is_new"))
        .orderBy(col("user_id"))
    },
    Some("""WITH prev AS (
           |  SELECT user_id, MIN(epoch_us(ts)) AS prev_first_us
           |  FROM events
           |  WHERE event_id < (SELECT min(event_id) + 5000 FROM events)
           |  GROUP BY user_id),
           |cur AS (
           |  SELECT user_id, MIN(epoch_us(ts)) AS cur_first_us
           |  FROM events GROUP BY user_id)
           |SELECT cur.user_id,
           |  COALESCE(prev_first_us, cur_first_us) AS first_seen_us,
           |  CASE WHEN prev_first_us IS NULL THEN 1 ELSE 0 END AS is_new
           |FROM cur LEFT JOIN prev ON cur.user_id = prev.user_id
           |ORDER BY cur.user_id""".stripMargin))

  /** U2+ST2 — calendar-slice union ≡ whole-range single plan: the
    * reference processes month×quarter slices and concats
    * (`...route...py:129-136`); here both halves are unioned and
    * aggregated in one plan, proving slice-invariance. */
  val q22 = QueryDef(
    "q22_slice_union",
    (s, dir) => {
      val ev = Tables.events(s, dir)
        .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
      val s1 = ev.where(col("day") <= "2024-01-15")
      val s2 = ev.where(col("day") > "2024-01-15")
      s1.union(s2)
        .groupBy(col("event_type"))
        // exact cents sum (see Cleaning.sumExact2)
        .agg(count(lit(1)).as("n"),
          Cleaning.sumExact2(col("value")).as("total_value"))
        .orderBy(col("event_type"))
    },
    Some("""SELECT event_type, CAST(count(*) AS BIGINT) AS n,
           |  CAST(SUM(CAST(round(value*100) AS BIGINT)) AS DOUBLE) / 100.0
           |    AS total_value
           |FROM events
           |GROUP BY event_type
           |ORDER BY event_type""".stripMargin))

  /** F21+J4 — composite categorical dispatch (region × type → service
    * label) as a codegen'd when-chain over joined dims
    * (`...ridership...py:129-148`). */
  val q23 = QueryDef(
    "q23_service_dispatch",
    (s, dir) => {
      val cust = Tables.customer(s, dir)
      val nat = broadcast(Tables.nation(s, dir))
      val stype = when(col("c_mktsegment").isin("MACHINERY", "AUTOMOBILE"), "Link")
        .when(col("c_mktsegment") === "BUILDING", "Regional")
        .otherwise("Local")
      cust.join(nat, cust("c_nationkey") === nat("n_nationkey"), "left")
        .withColumn("service_type", Cleaning.serviceType(col("n_name"), stype))
        .groupBy(col("service_type"))
        .agg(count(lit(1)).as("n_customers"))
        .orderBy(col("service_type"))
    },
    Some("""WITH st AS (
           |  SELECT n_name,
           |    CASE WHEN c_mktsegment IN ('MACHINERY', 'AUTOMOBILE') THEN 'Link'
           |         WHEN c_mktsegment = 'BUILDING' THEN 'Regional'
           |         ELSE 'Local' END AS stype
           |  FROM customer LEFT JOIN nation ON c_nationkey = n_nationkey)
           |SELECT CASE WHEN n_name IS NULL OR stype IS NULL THEN 'Unknown'
           |            WHEN stype = 'Link' THEN n_name || ' Link'
           |            WHEN stype = 'Regional' THEN n_name || ' Regional'
           |            ELSE n_name || ' Local' END AS service_type,
           |  CAST(count(*) AS BIGINT) AS n_customers
           |FROM st
           |GROUP BY 1
           |ORDER BY 1""".stripMargin))

  /** A9 — "overall" rollup in one pass via GROUPING SETS instead of the
    * reference's second full aggregation pass + union
    * (`scripts/ads_passenger_travel_info_mi.py:316-342`): one shuffle
    * yields both grains. */
  val q24 = QueryDef(
    "q24_rollup_overall",
    (s, dir) => {
      val o = Tables.orders(s, dir)
      Rollups.withOverall(o,
          keepCols = Seq(col("o_orderstatus")),
          overallCol = "o_orderpriority",
          overallLabel = "overall",
          aggs = Seq(
            count(lit(1)).as("n_orders"),
            // exact cents sum (see Cleaning.sumExact2)
            Cleaning.sumExact2(col("o_totalprice")).as("total_price")))
        .select(col("o_orderstatus"), col("o_orderpriority"),
                col("n_orders"), col("total_price"))
        .orderBy(col("o_orderstatus"), col("o_orderpriority"))
    },
    Some("""SELECT o_orderstatus,
           |  COALESCE(o_orderpriority, 'overall') AS o_orderpriority,
           |  CAST(count(*) AS BIGINT) AS n_orders,
           |  CAST(SUM(CAST(round(o_totalprice*100) AS BIGINT)) AS DOUBLE) / 100.0
           |    AS total_price
           |FROM orders
           |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus))
           |ORDER BY o_orderstatus, o_orderpriority""".stripMargin))

  /** Rolling 7-day revenue per customer via a RANGE window frame —
    * value-based, not row-based: gaps in the day sequence shrink the
    * frame and same-day orders are peers on BOTH engines (a ROWS frame
    * would be nondeterministic under same-day ties; RANGE is the only
    * correct rolling-window form when the order key has duplicates).
    * One shuffle on the partition key, integer cents domain. */
  val q63 = QueryDef(
    "q63_rolling_range_window",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val o = Tables.orders(s, dir).select(
        col("o_orderkey"), col("o_custkey"),
        datediff(to_date(col("o_orderdate")), lit("1970-01-01").cast("date"))
          .cast("long").as("day"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("day"))
        .rangeBetween(-6, 0)
      o.withColumn("roll_cents_7d", sum(col("cents")).over(w))
        .select(col("o_orderkey"), col("o_custkey"), col("day"), col("roll_cents_7d"))
        .orderBy(col("o_orderkey"))
    },
    Some("""SELECT o_orderkey, o_custkey, day,
           |  CAST(SUM(cents) OVER (PARTITION BY o_custkey ORDER BY day
           |       RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT)
           |    AS roll_cents_7d
           |FROM (SELECT o_orderkey, o_custkey,
           |        CAST(datediff('day', DATE '1970-01-01',
           |             CAST(o_orderdate AS DATE)) AS BIGINT) AS day,
           |        CAST(round(o_totalprice * 100) AS BIGINT) AS cents
           |      FROM orders)
           |ORDER BY o_orderkey""".stripMargin))

  /** Exact discrete percentiles per group
    * ([[graft.ops.Distributions.discPercentiles]]): the
    * travel-time-distribution summary shape in a reproducible integer
    * domain. Both engines pick the value at 1-based rank
    * `(n·p + 99) div 100` of the cents-sorted group — no float ceil, no
    * interpolation, tie-proof (rank permutations among equal values
    * pick the same value). */
  val q64 = QueryDef(
    "q64_percentile_disc",
    (s, dir) => {
      val li = Tables.lineitem(s, dir).select(
        col("l_returnflag"), col("l_linestatus"),
        round(col("l_extendedprice") * 100).cast("long").as("cents"))
      graft.ops.Distributions
        .discPercentilesBucketed(li, Seq("l_returnflag", "l_linestatus"),
          col("cents"), Seq(50, 90, 99))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },
    Some("""WITH v AS (
           |  SELECT l_returnflag, l_linestatus,
           |    CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
           |  FROM lineitem),
           |r AS (
           |  SELECT l_returnflag, l_linestatus, cents,
           |    row_number() OVER (PARTITION BY l_returnflag, l_linestatus
           |                       ORDER BY cents) AS rn,
           |    count(*) OVER (PARTITION BY l_returnflag, l_linestatus) AS n
           |  FROM v)
           |SELECT l_returnflag, l_linestatus, CAST(MAX(n) AS BIGINT) AS n,
           |  MAX(CASE WHEN rn = (n*50 + 99) // 100 THEN cents END) AS p50,
           |  MAX(CASE WHEN rn = (n*90 + 99) // 100 THEN cents END) AS p90,
           |  MAX(CASE WHEN rn = (n*99 + 99) // 100 THEN cents END) AS p99
           |FROM r GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin))

  val all: Seq[QueryDef] =
    Seq(q16, q17, q18, q19, q20, q21, q22, q23, q24, q63, q64)
}
