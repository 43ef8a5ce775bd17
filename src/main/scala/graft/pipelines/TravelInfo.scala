package graft.pipelines

import graft.core.Tables
import graft.ops.{Cleaning, Rollups}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** EP1 — the reference's flagship chunked-accumulate pipeline
  * (`scripts/ads_passenger_travel_info_mi.py:364-524`) composed as ONE
  * Spark plan over the events/region fixtures:
  *
  *   clean keys → broadcast LINE join → broadcast OP_DEPT join →
  *   region filter → transfer-time window → month aggregates at
  *   (region ⊕ overall) → daily aggregates at (region ⊕ overall) →
  *   avg-daily-trips fold → ratio metrics → audit columns
  *
  * i.e. J1+J2+F1+F2-shape+P4+F16+F12+W1+W3+W6+F17+F10+A1-A5+A9+A15+
  * A16+F25+F15 in a single DAG — the reference's manual chunk loop
  * (S2/ST1) is Spark's partial+final aggregation; the per-key Python
  * dicts are two GROUPING SETS aggregations; the month × day fold is
  * one join instead of a nested driver loop.
  *
  * Fixture mapping (events has no AFC schema): uid=user_id,
  * route=event_type, journey=(uid, day), leg_id=row_number within
  * journey by (ts, event_id), ride duration = `value` minutes (end =
  * ts + value min), distance km = value/1000. The LINE dim derives
  * op_dep_no = length(route) % 6, joined to region(r_regionkey) — keys
  * 5 have no region row → 'Unknown' → filtered (P4), exactly the
  * reference's unmatched-route flow.
  *
  * Deviations from the reference, both deliberate and documented:
  *  - unique-passenger counts are exact `countDistinct`, not HLL(1%) —
  *    the oracle-checkable twin (q14 carries the HLL form);
  *  - audit create/update_time is the deterministic data watermark
  *    (max event ts), not wall-clock `datetime.now()` — same column
  *    contract (`...travel_info_mi.py:462-465`), reproducible output.
  */
object TravelInfo {

  /** Cleaned per-leg core shared by the monthly and daily variants:
    * the shared cleaned-event prefix ([[EventDims.cleanedEvents]]) plus
    * this pipeline's per-leg derivations (F9/F10/F12/F16, integer-µs
    * time math). NOT persisted here — each caller decides. */
  private def cleanedLegs(s: SparkSession, dir: String): DataFrame = {
    EventDims.cleanedEvents(s, dir)
      .withColumn("month", date_format(col("ts"), "yyyy-MM"))
      .withColumn("start_us", unix_micros(col("ts")))
      .withColumn("end_us",
        col("start_us") + round(col("value") * 60000000L).cast("long"))
      // exact integer centi-meters (the fixture's `value` is 2-decimal
      // by construction): double km sums are order-dependent in the
      // last bit, which flips round-half ties in the distance ratios
      // (measured: avg_travel_distance_by_journey at sf0.001)
      .withColumn("dist_cm", round(col("value") * 100).cast("long"))
  }

  /** Journey windows (W1+W3+W6+F17) over the cleaned legs. */
  private def addTransfer(legs: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"), col("day"))
      .orderBy(col("ts"), col("event_id"))
    legs
      .withColumn("leg_id", row_number().over(w))
      .withColumn("next_start_us", lead(col("start_us"), 1).over(w))
      .withColumn("gap_us", col("next_start_us") - col("end_us"))
      // the ONE copy of the 240-min transfer gate, in integer µs —
      // both grains sum this column (a second copy in an aggregate
      // would silently desynchronize if the cap ever changes)
      .withColumn("transfer_us",
        when(col("next_start_us").isNull, 0L)
          .when(col("gap_us") < 0L || col("gap_us") > 240L * 60000000L, 0L)
          .otherwise(col("gap_us")))
  }

  def adsTravelInfoMonthly(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)

    // Persisted: the cleaned-leg core feeds BOTH the monthly branch
    // (which adds the journey window) and the daily branch (which
    // doesn't) — the reference's shared-subplan persist (SURVEY.md §4
    // "Shared-subplan reuse"); without it each grain re-scans and
    // re-joins the fact table.
    // narrow BEFORE caching: both grains read 9 of the ~17 columns
    // (the raw event cols incl. the props JSON are dead weight here)
    val legs = cleanedLegs(s, dir)
      .select(col("user_id"), col("day"), col("month"), col("ts"),
        col("event_id"), col("region_id"), col("start_us"), col("end_us"),
        col("dist_cm"))
      .transform(graft.core.Caching.eager)
    val withTransfer = addTransfer(legs)

    // --- monthly metrics at (month × region ⊕ overall), one pass (A9) -
    // time metrics in exact integer microseconds — see the q51 comment:
    // double minute-sums differ across engines in the last bit by
    // summation order, flipping round-half quotient boundaries
    val monthly = Rollups.withOverall(withTransfer,
      keepCols = Seq(col("month")), overallCol = "region_id",
      overallLabel = "overall",
      aggs = Seq(
        count(lit(1)).as("passenger_trips_num"),
        sum(when(col("leg_id") === 1, 1L).otherwise(0L)).as("journey_num"),
        sum(when(col("leg_id") =!= 1, 1L).otherwise(0L)).as("transfer_num"),
        sum(col("dist_cm")).as("dist_cm_sum"),
        sum(col("end_us") - col("start_us")).as("travel_time_us"),
        sum(col("transfer_us")).as("transfer_time_us")))

    // --- daily trips/users at (day × region ⊕ overall), folded (A15) --
    // from `legs`, not `withTransfer`: this grain needs no window.
    val daily = Rollups.withOverall(legs,
      keepCols = Seq(col("day")), overallCol = "region_id",
      overallLabel = "overall",
      aggs = Seq(
        count(lit(1)).as("trip_count"),
        countDistinct(col("user_id")).as("n_users")))
      .withColumn("month", substring(col("day"), 1, 7))
      .withColumn("dim", dayofmonth(last_day(to_date(col("day")))))
    // integer-domain fold (order-independent sums; see Rollups) — the
    // oracle replays the identical integer arithmetic
    val avgDaily = Rollups.avgDailyRatio(daily,
      Seq(col("month"), col("region_id")),
      col("trip_count"), col("n_users"), col("dim"),
      "avg_daily_trips_per_passenger")

    // --- audit watermark (F15, deterministic) -------------------------
    val audit = broadcast(ev.agg(
      date_format(max(col("ts")), "yyyy-MM-dd HH:mm:ss").as("audit_ts")))

    // --- final projection: ratio metrics (A16/F25) + audit columns ----
    monthly
      .join(avgDaily, Seq("month", "region_id"))
      .crossJoin(audit)
      .select(
        col("month").as("t_date"),
        lit("month").as("date_type"),
        col("region_id"),
        col("transfer_num"), col("journey_num"), col("passenger_trips_num"),
        Cleaning.roundHalfUpRatio(col("dist_cm_sum"), lit(1000L), 2)
          .as("travel_distance"),
        // integer-domain half-up rounding (Cleaning.roundHalfUpRatio):
        // µs/60000000 and µs/(60000000·n) hit exact half-way ties that
        // ROUND(double) resolves differently per engine; value·10^scale
        // cancels to µs/600000 resp. µs/(6000·n), so everything stays
        // in Long
        Cleaning.roundHalfUpRatio(col("travel_time_us"), lit(600000L), 2)
          .as("travel_time"),
        Cleaning.roundHalfUpRatio(col("transfer_time_us"), lit(600000L), 2)
          .as("transfer_time"),
        col("avg_daily_trips_per_passenger"),
        when(col("passenger_trips_num") > 0,
          Cleaning.roundHalfUpRatio(col("travel_time_us"),
            lit(6000L) * col("passenger_trips_num"), 4)).otherwise(0.0)
          .as("avg_travel_time_by_trips"),
        when(col("journey_num") > 0,
          Cleaning.roundHalfUpRatio(col("travel_time_us"),
            lit(6000L) * col("journey_num"), 4)).otherwise(0.0)
          .as("avg_travel_time_by_journey"),
        when(col("passenger_trips_num") > 0,
          Cleaning.roundHalfUpRatio(col("dist_cm_sum"),
            lit(10L) * col("passenger_trips_num"), 4)).otherwise(0.0)
          .as("avg_travel_distance_by_trips"),
        when(col("journey_num") > 0,
          Cleaning.roundHalfUpRatio(col("dist_cm_sum"),
            lit(10L) * col("journey_num"), 4)).otherwise(0.0)
          .as("avg_travel_distance_by_journey"),
        lit("system").as("create_by"),
        lit("system").as("update_by"),
        col("audit_ts").as("create_time"),
        col("audit_ts").as("update_time"))
      .orderBy(col("t_date"), col("region_id"))
  }

  /** `ads_passenger_travel_info_di` — the DAILY grain the data
    * inventory documents alongside the monthly table (same columns
    * minus the avg-daily fold, date_type='day'): one GROUPING SETS
    * pass over the windowed legs, ratio metrics, audit columns. */
  def adsTravelInfoDaily(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    // single consumer — no persist needed (one pass, no fan-out)
    val withTransfer = addTransfer(cleanedLegs(s, dir))
    // Time metrics aggregate in EXACT integer microseconds (the repo's
    // oracle-parity rule): double minute-sums differ between engines in
    // the last bit by summation order, which flips round-4 quotients
    // that land exactly on a rounding boundary (measured: one
    // avg_travel_time_by_journey tie at sf0.01). Integer sums are
    // order-free; the single double division afterwards is identical
    // arithmetic on identical inputs in both engines.
    val daily = Rollups.withOverall(withTransfer,
      keepCols = Seq(col("day")), overallCol = "region_id",
      overallLabel = "overall",
      aggs = Seq(
        count(lit(1)).as("passenger_trips_num"),
        sum(when(col("leg_id") === 1, 1L).otherwise(0L)).as("journey_num"),
        sum(when(col("leg_id") =!= 1, 1L).otherwise(0L)).as("transfer_num"),
        sum(col("dist_cm")).as("dist_cm_sum"),
        sum(col("end_us") - col("start_us")).as("travel_time_us"),
        sum(col("transfer_us")).as("transfer_time_us")))
    val audit = broadcast(ev.agg(
      date_format(max(col("ts")), "yyyy-MM-dd HH:mm:ss").as("audit_ts")))
    daily
      .crossJoin(audit)
      .select(
        col("day").as("t_date"),
        lit("day").as("date_type"),
        col("region_id"),
        col("transfer_num"), col("journey_num"), col("passenger_trips_num"),
        Cleaning.roundHalfUpRatio(col("dist_cm_sum"), lit(1000L), 2)
          .as("travel_distance"),
        // integer-domain half-up rounding — see the monthly grain above
        // (measured: avg_travel_time_by_trips tie at sf0.001)
        Cleaning.roundHalfUpRatio(col("travel_time_us"), lit(600000L), 2)
          .as("travel_time"),
        Cleaning.roundHalfUpRatio(col("transfer_time_us"), lit(600000L), 2)
          .as("transfer_time"),
        when(col("passenger_trips_num") > 0,
          Cleaning.roundHalfUpRatio(col("travel_time_us"),
            lit(6000L) * col("passenger_trips_num"), 4)).otherwise(0.0)
          .as("avg_travel_time_by_trips"),
        when(col("journey_num") > 0,
          Cleaning.roundHalfUpRatio(col("travel_time_us"),
            lit(6000L) * col("journey_num"), 4)).otherwise(0.0)
          .as("avg_travel_time_by_journey"),
        when(col("passenger_trips_num") > 0,
          Cleaning.roundHalfUpRatio(col("dist_cm_sum"),
            lit(10L) * col("passenger_trips_num"), 4)).otherwise(0.0)
          .as("avg_travel_distance_by_trips"),
        when(col("journey_num") > 0,
          Cleaning.roundHalfUpRatio(col("dist_cm_sum"),
            lit(10L) * col("journey_num"), 4)).otherwise(0.0)
          .as("avg_travel_distance_by_journey"),
        lit("system").as("create_by"),
        lit("system").as("update_by"),
        col("audit_ts").as("create_time"),
        col("audit_ts").as("update_time"))
      .orderBy(col("t_date"), col("region_id"))
  }
}
