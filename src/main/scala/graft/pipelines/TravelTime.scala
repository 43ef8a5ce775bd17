package graft.pipelines

import graft.core.Tables
import graft.ops.{Cleaning, TimeOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** EP3 — `ads_passenger_travel_time_di`
  * (`scripts/ads_passenger_travel_time_di.R:94-288`) as one plan:
  *
  *   region map join (J7) → per-leg travel-time 9-bin (F12+F19) →
  *   three aggregate sub-plans over a shared persisted core — trips,
  *   journeys (A11 re-bin of per-journey sums), transfers (W2-shaped
  *   multi-leg filter) — → two full-outer joins (J8) → 'Overall'
  *   re-aggregation + union (A9/U3) → ordered output (O2).
  *
  * Reference semantics preserved deliberately:
  *  - transfer legs are binned by the LEG's travel time, not the
  *    transfer gap (`...travel_time_di.R:181-193` bins
  *    `travel_time_minutes` inside transfer_data — a reference quirk
  *    mirrored, not "fixed");
  *  - the 'Overall' label is capital-O here vs 'overall' in EP1
  *    (SURVEY.md §7.4 risk 3 — per-pipeline constants);
  *  - regional rows keep NULL metrics after the full-outer joins (the
  *    R rbind writes NA); only the Overall re-aggregation zero-fills
  *    (R `sum(na.rm=T)` of all-NA = 0).
  *
  * All binning runs on exact integer microseconds so summed journey
  * times can never straddle a bin boundary differently across engines.
  * Fixture mapping matches q39: uid=user_id, route=event_type,
  * journey=(uid, day), ride duration = `value` minutes.
  */
object TravelTime {

  def adsTravelTimeDaily(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)

    // route→region mapping (J7: distinct routes + region rule)
    val line = ev.select(col("event_type").as("line_abbr")).distinct()
      .withColumn("line_clean", Cleaning.deepClean(col("line_abbr")))
      // J1 right-side dedup, deterministically: min(raw) per cleaned
      // key (dropDuplicates keeps an arbitrary row, and op_dep_no
      // derives from the surviving raw value)
      .groupBy(col("line_clean")).agg(min(col("line_abbr")).as("line_abbr"))
      .withColumn("op_dep_no", length(col("line_abbr")) % 6)
    val opDept = Tables.region(s, dir)
      .select(col("r_regionkey").as("op_dep_no"), col("r_name").as("region_name"))

    val w = Window.partitionBy(col("user_id"), col("day"))
    val wOrd = w.orderBy(col("ts"), col("event_id"))
    val legs = ev
      .withColumn("route_clean", Cleaning.deepClean(col("event_type")))
      .join(broadcast(line), col("route_clean") === col("line_clean"), "left")
      .join(broadcast(opDept), Seq("op_dep_no"), "left")
      .withColumn("region_id", coalesce(col("region_name"), lit("Unknown")))
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
      .withColumn("travel_us", round(col("value") * 60000000L).cast("long"))
      .withColumn("time_range_type", TimeOps.timeRangeBin(col("value")))
      .withColumn("leg_id", row_number().over(wOrd))
      .withColumn("n_legs", count(lit(1)).over(w))
      // narrow BEFORE caching: the three consumers need 7 columns; the
      // wide row (raw event cols incl. the props JSON) roughly doubles
      // the cache build + scan cost for bytes nothing reads
      .select(col("day"), col("region_id"), col("user_id"),
        col("time_range_type"), col("travel_us"), col("leg_id"), col("n_legs"))
      .transform(graft.core.Caching.eager)

    val keys = Seq("ope_date", "time_range_type", "region_id")

    // trips and transfers group by the SAME keys (the reference bins
    // transfer legs by the leg's own travel time — `...travel_time_di
    // .R:181-193`), so both fold into one aggregation pass; a
    // conditional count stands in for the reference's filtered copy.
    // `transfer_num` must be NULL (not 0) where no transfer leg exists:
    // the R pipeline's full-join leaves NA there, and trips-only rows
    // must keep producing NULL through the journeys full-outer below.
    val tripsTransfers = legs
      .groupBy(col("day").as("ope_date"), col("time_range_type"), col("region_id"))
      .agg(count(lit(1)).as("passenger_trips_num"),
        nullif(sum(when(col("n_legs") > 1 && col("leg_id") > 1, 1L)
          .otherwise(0L)), lit(0L)).as("transfer_num"))

    val journeys = legs
      .groupBy(col("day").as("ope_date"), col("user_id"), col("region_id"))
      .agg(sum(col("travel_us")).as("journey_us"))
      .withColumn("time_range_type", TimeOps.timeRangeBinUs(col("journey_us")))
      .groupBy(col("ope_date"), col("time_range_type"), col("region_id"))
      .agg(count(lit(1)).as("journey_num"))

    val joined = tripsTransfers
      .join(journeys, keys, "full_outer")

    val overall = joined
      .groupBy(col("ope_date"), col("time_range_type"))
      .agg(
        coalesce(sum(col("passenger_trips_num")), lit(0L)).as("passenger_trips_num"),
        coalesce(sum(col("journey_num")), lit(0L)).as("journey_num"),
        coalesce(sum(col("transfer_num")), lit(0L)).as("transfer_num"))
      .withColumn("region_id", lit("Overall"))
      .select(col("ope_date"), col("time_range_type"), col("region_id"),
        col("passenger_trips_num"), col("journey_num"), col("transfer_num"))

    joined
      .select(col("ope_date"), col("time_range_type"), col("region_id"),
        col("passenger_trips_num"), col("journey_num"), col("transfer_num"))
      .union(overall)
      .orderBy(col("ope_date"), col("time_range_type"), col("region_id"))
  }
}
