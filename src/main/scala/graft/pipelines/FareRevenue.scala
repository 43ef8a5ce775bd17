package graft.pipelines

import graft.core.Tables
import graft.ops.{Cleaning, Rollups}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Revenue family — `ads_fare_revenue_region_mi`. The reference script
  * documents this table's full schema and ratio formulas in its header
  * (`scripts/ads_fare_revenue_region_mi.R:1-22`: fare_revenue,
  * average_daily_revenue, average_fare, inspection/evasion counts, and
  * four guarded ratios at monthly × region ⊕ Overall grain) and loads
  * the inspection/fines inputs (`:33-36`), but the body only ever
  * builds the sibling CSC sales table (q44 carries that one). This
  * pipeline implements the DOCUMENTED schema — the missing product
  * table a reference user would expect:
  *
  *   fare grain (orders) + inspection grain (order lines), tag-unioned
  *   with mutually-zeroed metrics into ONE month × region ⊕ Overall
  *   GROUPING SETS pass (A8/A9; zero fills ARE the left-join
  *   semantics, since every trip's keys exist among the fare rows)
  *   → days-in-month fold
  *   for average_daily_revenue (F13) → guarded round-4 ratios
  *   (A16/F25) → round-2 money columns → literal audit columns (F15,
  *   the reference family hardcodes author+timestamp — mirrored).
  *
  * Fixture mapping: fare transactions = orders (fare = o_totalprice,
  * month = o_orderdate, region = o_custkey % 5 → region dim);
  * inspection list = lineitem via its order (inspected where
  * l_returnflag != 'N', evasion where l_returnflag = 'R', trip =
  * l_orderkey); passenger_carried = paying passengers + detected
  * evaders.
  */
object FareRevenue {

  def adsFareRevenueMonthly(s: SparkSession, dir: String): DataFrame = {
    val region = broadcast(Tables.region(s, dir)
      .select(col("r_regionkey"), col("r_name").as("region_id")))

    // the projected orders subplan feeds both grains (fare rows and
    // the inspection key join). NOT cached (round-8 change, same
    // rationale as q55): a column-pruned scan + broadcast dim join
    // recomputed inside one job beats Caching.eager's serial barrier
    // build. Fares aggregate in exact integer CENTS (o_totalprice is
    // 2-decimal money; double sums differ across engines in the last
    // bit by summation order, flipping round-half boundaries — the
    // same tie class q51 hit on minute-sums).
    // region_id derives from o_custkey AFTER the union (one broadcast
    // join on the unioned stream instead of one per branch; the
    // orderkey join's orders side stays a plain scan, so its smaller
    // size estimate makes it the build side)
    val orders = Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_custkey"),
        date_format(col("o_orderdate"), "yyyy-MM").as("t_date"),
        round(col("o_totalprice") * 100).cast("long").as("fare_cents"),
        dayofmonth(last_day(col("o_orderdate"))).as("dim"))

    // Two-phase distinct (the ops/Skew shape, exact here): each order
    // belongs to exactly ONE (month, region) — region derives from
    // o_custkey, the month from o_orderdate — so pre-aggregating per
    // trip turns the two COUNT DISTINCT(l_orderkey)s into plain sums.
    // The direct form plans a multi-distinct Expand over the whole
    // lineitem⋈orders join (3× the rows through the exchange, distinct
    // state per grain); this one is partial-aggregable map-side at
    // both levels and the GROUPING SETS expand runs over the tiny
    // per-trip table.
    // Round-9 (the q55 sf100 lesson): the per-trip aggregation is a
    // pure function of lineitem, so it runs BEFORE the orderkey join —
    // the join probes ~n_orders pre-aggregated rows instead of every
    // leg, the map-side partial agg collapses multi-leg orders inside
    // their (orderkey-clustered) scan partitions, and the agg output
    // arrives at the join already hash-partitioned on the join key.
    // t_date/o_custkey are functions of the trip, so attaching them
    // after the agg changes nothing.
    val perTrip = Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_returnflag"))
      .groupBy(col("l_orderkey"))
      .agg(
        sum(when(col("l_returnflag") =!= "N", 1L).otherwise(0L)).as("insp_legs"),
        sum(when(col("l_returnflag") === "R", 1L).otherwise(0L)).as("evade_legs"),
        count(lit(1)).as("legs"))
      // pinned shuffled-hash — same rationale as q55/q56's orderkey join
      .join(orders.select(col("o_orderkey"), col("o_custkey"), col("t_date"))
          .hint("shuffle_hash"),
        col("l_orderkey") === col("o_orderkey"))

    // TAGGED UNION, ONE GROUPING SETS PASS (round-8 restructure): fare
    // rows (one per order) and per-trip inspection rows carry
    // mutually-zeroed metric columns, so a single Expand + hash agg
    // produces BOTH metric families at BOTH grains — replacing the
    // former two withOverall aggregations meeting in a broadcast join.
    // Zero fills reproduce the old LEFT join exactly: every per-trip
    // key combination exists among the fare rows (a trip's order IS a
    // fare row). The Expand row volume is unchanged (both inputs were
    // already expanded); one exchange and the join stage disappear.
    val fareRows = orders.select(col("t_date"), col("o_custkey"),
      col("fare_cents"), lit(1L).as("pax"), col("dim"),
      lit(0L).as("insp_legs"), lit(0L).as("evade_legs"),
      lit(0L).as("insp_trip"), lit(0L).as("trip_n"), lit(0L).as("legs"))
    val tripRows = perTrip.select(col("t_date"), col("o_custkey"),
      lit(0L).as("fare_cents"), lit(0L).as("pax"), lit(0).as("dim"),
      col("insp_legs"), col("evade_legs"),
      when(col("insp_legs") > 0, 1L).otherwise(0L).as("insp_trip"),
      lit(1L).as("trip_n"), col("legs"))

    val merged = Rollups.withOverall(fareRows.union(tripRows)
        .join(region, col("o_custkey") % 5 === col("r_regionkey")),
      keepCols = Seq(col("t_date")), overallCol = "region_id",
      overallLabel = "Overall",
      aggs = Seq(
        sum(col("fare_cents")).as("fare_cents"),
        sum(col("pax")).as("passenger_num"),
        max(col("dim")).as("days_in_month"),
        sum(col("insp_legs")).as("passengers_inspection_num"),
        sum(col("evade_legs")).as("fare_evasion_passenger_num"),
        sum(col("insp_trip")).as("inspected_trips"),
        sum(col("trip_n")).as("total_scheduled_trips"),
        sum(col("insp_legs")).as("actual_inspections_num"),
        sum(col("legs")).as("planned_inspections_num")))

    // integer-domain half-up rounding (see Cleaning.roundHalfUpRatio):
    // num/den count/money ratios hit exact half-way ties at the
    // rounding scale, and ROUND(double) resolves them differently per
    // engine (measured here: average_fare at sf0.001)
    def ratio4(num: org.apache.spark.sql.Column, den: org.apache.spark.sql.Column) =
      when(den > 0, Cleaning.roundHalfUpRatio(num * 10000L, den, 4))
        .otherwise(0.0)

    merged
      .select(
        col("t_date"), lit("month").as("date_type"), col("region_id"),
        round(col("fare_cents").cast("double") / 100.0, 2).as("fare_revenue"),
        Cleaning.roundHalfUpRatio(col("fare_cents"), col("days_in_month")
          .cast("long"), 2).as("average_daily_revenue"),
        Cleaning.roundHalfUpRatio(col("fare_cents"), col("passenger_num"), 2)
          .as("average_fare"),
        coalesce(col("passengers_inspection_num"), lit(0L))
          .as("passengers_inspection_num"),
        coalesce(col("fare_evasion_passenger_num"), lit(0L))
          .as("fare_evasion_passenger_num"),
        col("passenger_num"),
        (col("passenger_num") + coalesce(col("fare_evasion_passenger_num"), lit(0L)))
          .as("passenger_carried"),
        ratio4(coalesce(col("passengers_inspection_num"), lit(0L)),
          col("passenger_num") + coalesce(col("fare_evasion_passenger_num"), lit(0L)))
          .as("passenger_inspection_ratio"),
        coalesce(col("inspected_trips"), lit(0L)).as("inspected_trips"),
        coalesce(col("total_scheduled_trips"), lit(0L)).as("total_scheduled_trips"),
        coalesce(col("actual_inspections_num"), lit(0L)).as("actual_inspections_num"),
        coalesce(col("planned_inspections_num"), lit(0L)).as("planned_inspections_num"),
        ratio4(coalesce(col("fare_evasion_passenger_num"), lit(0L)),
          col("passenger_num")).as("fare_evasion_ratio"),
        ratio4(coalesce(col("inspected_trips"), lit(0L)),
          coalesce(col("total_scheduled_trips"), lit(0L)))
          .as("bus_trip_inspection_ratio"),
        ratio4(coalesce(col("actual_inspections_num"), lit(0L)),
          coalesce(col("planned_inspections_num"), lit(0L)))
          .as("inspection_plan_adherence_ratio"),
        lit("system").as("create_by"), lit("system").as("update_by"),
        lit("2025-09-01 11:07:58").as("create_time"),
        lit("2025-09-01 11:07:58").as("update_time"))
      .orderBy(col("t_date"), col("region_id"))
  }
}
