package graft.queries

import graft.QueryDef
import graft.core.Tables
import graft.ops.Journeys
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream (leg/journey-shaped) capabilities over the `events`
  * table: windows W1-W6, spine/full-outer/anti joins J5/J8/J13, set ops
  * U1-U5, histogram + survival-difference A6/A7, exact & approximate
  * distincts A4, and the two-granularity daily-average fold A15
  * (SURVEY.md §2.4-2.7).
  *
  * `events.ts` is nanosecond parquet; both engines truncate to
  * microseconds (Spark via nanosAsLong + `div 1000`, DuckDB at read).
  * All time arithmetic in oracle-checked queries stays in integer
  * microseconds (`unix_micros` / `epoch_us`) for bit-deterministic
  * compares.
  */
object EventFlows {

  /** W1+W6+F17 — next-event gap per user ("transfer time" shape,
    * `scripts/ads_passenger_travel_info_mi.py:195-210`): lead over a
    * (user, time) window, gap clamped to [0, 240 min] with
    * out-of-range → 0 and 0 on the last event. One shuffle (the window
    * partition); at scale the window key (user_id) is high-cardinality
    * so partitions balance.
    */
  val q04 = QueryDef(
    "q04_window_lead_gap",
    (s, dir) => {
      val ev = Tables.events(s, dir)
      val w = Journeys.orderedWindow(Seq(col("user_id")), Seq(col("ts"), col("event_id")))
      ev.withColumn("next_ts", Journeys.nextInGroup(col("ts"), w))
        .select(
          col("user_id"), col("event_id"),
          Journeys.transferMicros(col("ts"), col("next_ts")).as("gap_us"))
        .orderBy(col("user_id"), col("event_id"))
    },
    Some("""WITH w AS (
           |  SELECT user_id, event_id, ts,
           |         lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_ts
           |  FROM events)
           |SELECT user_id, event_id,
           |  CASE WHEN next_ts IS NULL THEN 0
           |       WHEN epoch_us(next_ts) - epoch_us(ts) < 0
           |         OR epoch_us(next_ts) - epoch_us(ts) > 14400000000 THEN 0
           |       ELSE epoch_us(next_ts) - epoch_us(ts) END AS gap_us
           |FROM w
           |ORDER BY user_id, event_id""".stripMargin))

  /** W2 + running-sum sessionization: lag-gap > 30 min opens a session;
    * per-session event count and exact integer duration. The inverse of
    * the reference's pre-grouped journey_id (SURVEY.md §2.5 W2).
    */
  val q05 = QueryDef(
    "q05_sessionize",
    (s, dir) => {
      val ev = Tables.events(s, dir)
      val sess = Journeys.sessionize(ev, Seq(col("user_id")), col("ts"), 30.0, "session_id")
      sess.groupBy(col("user_id"), col("session_id"))
        .agg(
          count(lit(1)).as("n_events"),
          (max(unix_micros(col("ts"))) - min(unix_micros(col("ts")))).as("duration_us"))
        .orderBy(col("user_id"), col("session_id"))
    },
    Some("""WITH g AS (
           |  SELECT user_id, ts,
           |         CASE WHEN lag(ts) OVER w IS NULL
           |               OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
           |              THEN 1 ELSE 0 END AS is_new
           |  FROM events
           |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
           |sess AS (
           |  SELECT user_id, ts,
           |         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
           |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
           |  FROM g)
           |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           |  CAST(count(*) AS BIGINT) AS n_events,
           |  MAX(epoch_us(ts)) - MIN(epoch_us(ts)) AS duration_us
           |FROM sess
           |GROUP BY user_id, session_id
           |ORDER BY user_id, session_id""".stripMargin))

  /** W4 — last row per group by descending time with deterministic
    * tie-break (`ads_stop_passenger_trips_di...py:62-65`). */
  val q06 = QueryDef(
    "q06_last_event_per_day",
    (s, dir) => {
      val ev = Tables.events(s, dir)
        .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
      Journeys.lastRowPerGroup(ev, Seq(col("user_id"), col("day")),
          unix_micros(col("ts")), col("event_id"))
        .select(col("user_id"), col("day"), col("event_id"), col("event_type"))
        .orderBy(col("user_id"), col("day"))
    },
    Some("""WITH r AS (
           |  SELECT user_id, strftime(ts, '%Y-%m-%d') AS day, event_id, event_type,
           |         row_number() OVER (PARTITION BY user_id, strftime(ts, '%Y-%m-%d')
           |                            ORDER BY ts DESC, event_id DESC) AS rn
           |  FROM events)
           |SELECT user_id, day, event_id, event_type
           |FROM r WHERE rn = 1
           |ORDER BY user_id, day""".stripMargin))

  /** W3 — group-max-as-column flag (`transform('max') == leg_id`,
    * `scripts/ads_passenger_travel_info_mi.py:209-210`): events whose
    * value equals their user's maximum. */
  val q07 = QueryDef(
    "q07_group_max_flag",
    (s, dir) => {
      val ev = Tables.events(s, dir)
      ev.withColumn("is_max", Journeys.isGroupMax(col("value"), Seq(col("user_id"))))
        .where(col("is_max"))
        .select(col("user_id"), col("event_id"), col("value"))
        .orderBy(col("user_id"), col("event_id"))
    },
    Some("""SELECT user_id, event_id, value
           |FROM (SELECT user_id, event_id, value,
           |             MAX(value) OVER (PARTITION BY user_id) AS mx
           |      FROM events)
           |WHERE value = mx
           |ORDER BY user_id, event_id""".stripMargin))

  /** J5+A10+U1+P8 — metric spine: distinct (day, event_type) spine,
    * four per-key metrics left-joined, nulls → 0
    * (`ads_stop_passenger_trips_di...py:39-81`). In Spark this collapses
    * to ONE grouped aggregation with conditional aggregates — the
    * preferred plan (SURVEY.md J5): one shuffle instead of four joins.
    */
  val q08 = QueryDef(
    "q08_spine_metrics",
    (s, dir) => {
      val ev = Tables.events(s, dir)
        .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
      ev.groupBy(col("day"), col("event_type"))
        .agg(
          count(lit(1)).as("n_events"),
          // exact cents sum (value is 2-decimal by data contract) —
          // double sums are order-dependent in the last bit, flipping
          // round-half ties cross-engine
          graft.ops.Cleaning.sumExact2(
            when(col("value") > 100, col("value")).otherwise(lit(0.0)))
            .as("big_value_sum"),
          countDistinct(col("user_id")).as("n_users"),
          sum(when(col("value") > 100, 1L).otherwise(0L)).as("n_big"))
        .orderBy(col("day"), col("event_type"))
    },
    Some("""SELECT strftime(ts, '%Y-%m-%d') AS day, event_type,
           |  CAST(count(*) AS BIGINT) AS n_events,
           |  CAST(SUM(CASE WHEN value > 100
           |           THEN CAST(round(value*100) AS BIGINT) ELSE 0 END)
           |       AS DOUBLE) / 100.0 AS big_value_sum,
           |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           |  CAST(SUM(CASE WHEN value > 100 THEN 1 ELSE 0 END) AS BIGINT) AS n_big
           |FROM events
           |GROUP BY 1, 2
           |ORDER BY 1, 2""".stripMargin))

  /** J8 — full-outer join of three aggregate legs on a shared key
    * (`ads_passenger_travel_time_di.R:258-262`), nulls coalesced to 0. */
  val q09 = QueryDef(
    "q09_full_outer_three_way",
    (s, dir) => {
      val ev = Tables.events(s, dir)
        .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
      val purchases = ev.where(col("event_type") === "purchase")
        .groupBy(col("day"))
        // exact cents sum — see q08
        .agg(graft.ops.Cleaning.sumExact2(col("value")).as("purchase_value"))
      val errors = ev.where(col("event_type") === "error")
        .groupBy(col("day")).agg(count(lit(1)).as("n_errors"))
      val signups = ev.where(col("event_type") === "signup")
        .groupBy(col("day")).agg(countDistinct(col("user_id")).as("n_signup_users"))
      purchases
        .join(errors, Seq("day"), "full_outer")
        .join(signups, Seq("day"), "full_outer")
        .select(
          col("day"),
          coalesce(col("purchase_value"), lit(0.0)).as("purchase_value"),
          coalesce(col("n_errors"), lit(0L)).as("n_errors"),
          coalesce(col("n_signup_users"), lit(0L)).as("n_signup_users"))
        .orderBy(col("day"))
    },
    Some("""WITH p AS (
           |  SELECT strftime(ts, '%Y-%m-%d') AS day,
           |         CAST(SUM(CAST(round(value*100) AS BIGINT)) AS DOUBLE) / 100.0
           |           AS purchase_value
           |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
           |e AS (
           |  SELECT strftime(ts, '%Y-%m-%d') AS day, CAST(count(*) AS BIGINT) AS n_errors
           |  FROM events WHERE event_type = 'error' GROUP BY 1),
           |s AS (
           |  SELECT strftime(ts, '%Y-%m-%d') AS day,
           |         CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_signup_users
           |  FROM events WHERE event_type = 'signup' GROUP BY 1)
           |SELECT COALESCE(p.day, e.day, s.day) AS day,
           |  COALESCE(purchase_value, 0) AS purchase_value,
           |  COALESCE(n_errors, 0) AS n_errors,
           |  COALESCE(n_signup_users, 0) AS n_signup_users
           |FROM p
           |FULL OUTER JOIN e ON p.day = e.day
           |FULL OUTER JOIN s ON COALESCE(p.day, e.day) = s.day
           |ORDER BY day""".stripMargin))

  /** A6+A7 — per-group ordinal histogram and survival-difference: number
    * of (user, day) "journeys" with exactly k events = count(rows with
    * ordinal k) − count(rows with ordinal k+1), clamped ≥ 0
    * (`scripts/ads_passenger_transfer_count_di.py:213-244`). */
  val q10 = QueryDef(
    "q10_survival_histogram",
    (s, dir) => {
      val ev = Tables.events(s, dir)
        .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
      val wOrd = Window.partitionBy(col("user_id"), col("day"))
        .orderBy(col("ts"), col("event_id"))
      val legs = ev.withColumn("leg_id", row_number().over(wOrd))
      val hist = legs.groupBy(col("day"), col("leg_id"))
        .agg(count(lit(1)).as("cnt"))
      graft.ops.Rollups.survivalDiff(hist, Seq(col("day")), col("leg_id"),
          col("cnt"), "journey_num")
        .select(col("day"), col("leg_id"), col("journey_num"))
        .orderBy(col("day"), col("leg_id"))
    },
    Some("""WITH legs AS (
           |  SELECT strftime(ts, '%Y-%m-%d') AS day,
           |         row_number() OVER (PARTITION BY user_id, strftime(ts, '%Y-%m-%d')
           |                            ORDER BY ts, event_id) AS leg_id
           |  FROM events),
           |hist AS (
           |  SELECT day, CAST(leg_id AS INTEGER) AS leg_id, CAST(count(*) AS BIGINT) AS cnt
           |  FROM legs GROUP BY day, leg_id)
           |SELECT day, leg_id,
           |  GREATEST(cnt - COALESCE(lead(cnt) OVER (PARTITION BY day ORDER BY leg_id), 0),
           |           0) AS journey_num
           |FROM hist
           |ORDER BY day, leg_id""".stripMargin))

  /** J13+U4 — anti join: users who purchased but never signed up
    * (set-difference diagnostic,
    * `scripts/ads_passenger_transfer_count_di.py:131-137`). */
  val q11 = QueryDef(
    "q11_anti_join",
    (s, dir) => {
      val ev = Tables.events(s, dir)
      val purchasers = ev.where(col("event_type") === "purchase")
        .select(col("user_id")).distinct()
      val signups = ev.where(col("event_type") === "signup")
        .select(col("user_id")).distinct()
      purchasers.join(signups, Seq("user_id"), "left_anti")
        .orderBy(col("user_id"))
    },
    Some("""SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
           |EXCEPT
           |SELECT DISTINCT user_id FROM events WHERE event_type = 'signup'
           |ORDER BY user_id""".stripMargin))

  /** U5 — deterministic dedup: earliest event per (user, type) via an
    * ordered row_number (the reference's `drop_duplicates(subset=...)`
    * keeps first-in-file-order — `...route...py:103`; we make the order
    * explicit so the pick is reproducible under parallelism). */
  val q12 = QueryDef(
    "q12_dedup_first_per_key",
    (s, dir) => {
      val ev = Tables.events(s, dir)
      val w = Window.partitionBy(col("user_id"), col("event_type"))
        .orderBy(col("ts"), col("event_id"))
      ev.withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .select(col("user_id"), col("event_type"), col("event_id"))
        .orderBy(col("user_id"), col("event_type"))
    },
    Some("""SELECT user_id, event_type, event_id
           |FROM (SELECT user_id, event_type, event_id,
           |             row_number() OVER (PARTITION BY user_id, event_type
           |                                ORDER BY ts, event_id) AS rn
           |      FROM events)
           |WHERE rn = 1
           |ORDER BY user_id, event_type""".stripMargin))

  /** A4 (exact twin) — per-day exact distinct users. The approximate
    * HLL form is q14 (rows-only + ScalaTest tolerance check), because
    * `approx_count_distinct` cannot hash-match an exact oracle
    * (SURVEY.md §7.4 risk 2). */
  val q13 = QueryDef(
    "q13_distinct_exact",
    (s, dir) => {
      Tables.events(s, dir)
        .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
        .groupBy(col("day"))
        .agg(countDistinct(col("user_id")).as("n_users"),
             count(lit(1)).as("n_events"))
        .orderBy(col("day"))
    },
    Some("""SELECT strftime(ts, '%Y-%m-%d') AS day,
           |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           |  CAST(count(*) AS BIGINT) AS n_events
           |FROM events GROUP BY 1 ORDER BY 1""".stripMargin))

  /** A4 — HyperLogLog distinct at rsd=1% (Spark HLL++ ≈ the reference's
    * `hyperloglog.HyperLogLog(0.01)`,
    * `scripts/ads_passenger_travel_info_mi.py:266`). At 100 TB this is
    * THE distinct-count operator — fixed-size sketch per group, no
    * distinct shuffle explosion.
    *
    * The sketch VALUE can never hash-match an ANSI oracle (every HLL
    * implementation rounds registers differently), so the registered
    * output is the ORACLE-CHECKABLE invariant instead: the exact
    * per-group distinct (DuckDB recomputes it) next to a boolean
    * pinning |approx − exact| ≤ 5 %·exact (5× the configured rsd —
    * HLL++ at 1 % rsd stays well inside). A broken sketch now fails
    * the hash gate, not just the LlmSpec tolerance spec. */
  val q14 = QueryDef(
    "q14_hll_distinct",
    (s, dir) => {
      // one pre-aggregation on (type, user) feeds BOTH counts: mixing
      // countDistinct with approx_count_distinct in a single agg plans
      // an Expand (every row duplicated per aggregate path) and a
      // double-width shuffle — measured 2.5 s vs 0.9 s for this form.
      // Over the deduplicated pairs the exact count is a plain count
      // and the HLL still sees each user once per type.
      // null users are excluded exactly as COUNT(DISTINCT user_id)
      // excludes them (the pre-distinct form would count a (type,
      // null) row)
      val perUser = Tables.events(s, dir)
        .select(col("event_type"), col("user_id"))
        .where(col("user_id").isNotNull)
        .distinct()
      perUser
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("exact_users"),
          approx_count_distinct(col("user_id"), 0.01).as("__approx"))
        .select(col("event_type"), col("exact_users"),
          (abs(col("__approx") - col("exact_users")) <=
            col("exact_users") * 0.05).as("hll_within_5rsd"))
        .orderBy(col("event_type"))
    },
    Some("""SELECT event_type,
           |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
           |  TRUE AS hll_within_5rsd
           |FROM events GROUP BY 1 ORDER BY 1""".stripMargin))

  /** A15+A16+F13+F25 — two-granularity fold: monthly avg-daily-ratio =
    * Σ_days(day_events / day_users) / days-in-month, zero-guarded
    * (`scripts/ads_passenger_travel_info_mi.py:411-436`). */
  val q15 = QueryDef(
    "q15_avg_daily_fold",
    (s, dir) => {
      val daily = Tables.events(s, dir)
        .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
        .groupBy(col("day"))
        .agg(count(lit(1)).as("n_events"), countDistinct(col("user_id")).as("n_users"))
        .withColumn("month", substring(col("day"), 1, 7))
        .withColumn("dim", dayofmonth(last_day(to_date(col("day")))))
      // the shared integer-domain fold (order-independent sums) — one
      // implementation for q15 and the q39 pipeline, one DuckDB twin
      graft.ops.Rollups.avgDailyRatio(daily, Seq(col("month")),
          col("n_events"), col("n_users"), col("dim"), "avg_daily_ratio",
          extraAggs = Seq(count(lit(1)).as("n_days")))
        .orderBy(col("month"))
    },
    Some("""WITH daily AS (
           |  SELECT strftime(ts, '%Y-%m-%d') AS day,
           |         count(*) AS n_events, COUNT(DISTINCT user_id) AS n_users
           |  FROM events GROUP BY 1)
           |SELECT substr(day, 1, 7) AS month,
           |  CAST((2*SUM(CASE WHEN n_users > 0
           |              THEN (2000000*n_events + n_users) // (2*n_users)
           |              ELSE 0 END)
           |        + 100*MAX(date_part('day', last_day(CAST(day AS DATE)))))
           |       // (200*MAX(date_part('day', last_day(CAST(day AS DATE)))))
           |       AS DOUBLE) / 10000.0 AS avg_daily_ratio,
           |  CAST(count(*) AS BIGINT) AS n_days
           |FROM daily
           |GROUP BY substr(day, 1, 7)
           |ORDER BY month""".stripMargin))

  /** As-of join ([[graft.ops.AsOf.asOfJoin]]): every tap priced by the
    * fare-policy version in force when it happened. The versioned dim
    * derives identically on both engines (three versions per route ×
    * month at days 1/10/20, fee arithmetic in the key and date), so the
    * oracle can use DuckDB's NATIVE `ASOF JOIN` — the two radically
    * different implementations (union + running last() window vs
    * DuckDB's sorted merge) must produce identical matches, ties and
    * all. Events on a version boundary (day 1/10/20 at 00:00) take that
    * version on both sides. */
  val q60 = QueryDef(
    "q60_asof_fare_version",
    (s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("ts"), col("event_type"), col("event_id"))
      val dimFee = ev.select(col("event_type"),
          date_trunc("month", col("ts")).as("m")).distinct()
        .select(col("event_type"), col("m"),
          explode(array(lit(0), lit(9), lit(19))).as("d"))
        .select(col("event_type"),
          (col("m") + make_dt_interval(col("d"))).as("valid_from"))
        .withColumn("fee",
          (length(col("event_type")) * 100 + dayofmonth(col("valid_from"))
            + month(col("valid_from"))).cast("long"))
      graft.ops.AsOf.asOfJoin(ev, dimFee, keys = Seq("event_type"),
          leftTime = "ts", rightTime = "valid_from")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("fee")).as("fee_sum"))
        .orderBy(col("event_type"))
    },
    Some("""WITH dim AS (
           |  SELECT event_type, valid_from,
           |    length(event_type)*100 + EXTRACT(day FROM valid_from)
           |      + EXTRACT(month FROM valid_from) AS fee
           |  FROM (SELECT DISTINCT event_type,
           |          date_trunc('month', ts) + INTERVAL (d) DAY AS valid_from
           |        FROM events, (VALUES (0), (9), (19)) v(d)))
           |SELECT e.event_type, CAST(count(*) AS BIGINT) AS n,
           |  CAST(SUM(d.fee) AS BIGINT) AS fee_sum
           |FROM events e ASOF JOIN dim d
           |  ON e.event_type = d.event_type AND e.ts >= d.valid_from
           |GROUP BY 1 ORDER BY 1""".stripMargin))

  /** Bucketed range join ([[graft.ops.RangeJoin.pointInInterval]]):
    * every lineitem shipment matched to the URGENT orders whose 7-day
    * window contains its ship date — a pure inequality join that Spark
    * would otherwise plan as a nested loop. The oracle states the SAME
    * semantics as the naive inequality join (DuckDB plans it as its
    * native IEJoin), so the bucketed rewrite is proven equivalent on
    * real data; `PlanSpec` pins that the Spark plan contains no
    * CartesianProduct / BroadcastNestedLoopJoin. Day arithmetic stays
    * in integer epoch days on both sides.
    *
    * The point side is pre-aggregated to day grain BEFORE the range
    * join: the final output only needs per-(flag,status) sums and a
    * distinct order count, so feeding raw lineitem rows (~600k at
    * sf0.1) through the join wastes ~40× the join input when
    * (ship_day, flag, status) groups (~10-15k) carry the same
    * information. Pair counts and quantity sums become weighted sums
    * of the per-day partials; `countDistinct(o_orderkey)` is
    * unaffected because distinctness is per (day-group × window) pair
    * and every matching order still appears. `PlanSpec` pins the
    * Aggregate below the join. */
  val q62 = QueryDef(
    "q62_range_join_windows",
    (s, dir) => {
      val epoch = lit("1970-01-01").cast("date")
      val li = Tables.lineitem(s, dir)
        .select(
          col("l_returnflag"), col("l_linestatus"), col("l_quantity"),
          datediff(to_date(col("l_shipdate")), epoch).cast("long").as("ship_day"))
        .groupBy(col("l_returnflag"), col("l_linestatus"), col("ship_day"))
        .agg(count(lit(1)).as("day_cnt"),
          sum(col("l_quantity").cast("long")).as("day_qty"))
      val win = Tables.orders(s, dir)
        .where(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"),
          datediff(to_date(col("o_orderdate")), epoch).cast("long").as("win_start"))
        .withColumn("win_end", col("win_start") + 6)
      graft.ops.RangeJoin
        .pointInInterval(li, "ship_day", win, "win_start", "win_end", bucketWidth = 7)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("day_cnt")).as("n_pairs"),
          sum(col("day_qty")).as("qty_sum"),
          countDistinct(col("o_orderkey")).as("n_orders"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },
    Some("""SELECT l_returnflag, l_linestatus,
           |  CAST(count(*) AS BIGINT) AS n_pairs,
           |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty_sum,
           |  CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_orders
           |FROM lineitem l JOIN orders o
           |  ON o.o_orderpriority = '1-URGENT'
           | AND CAST(l.l_shipdate AS DATE) >= CAST(o.o_orderdate AS DATE)
           | AND CAST(l.l_shipdate AS DATE) <= CAST(o.o_orderdate AS DATE) + INTERVAL 6 DAY
           |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin))

  val all: Seq[QueryDef] =
    Seq(q04, q05, q06, q07, q08, q09, q10, q11, q12, q13, q14, q15, q60, q62)
}
