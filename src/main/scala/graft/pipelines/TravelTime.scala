package graft.pipelines

import graft.ops.TimeOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** EP3 — `ads_passenger_travel_time_di`
  * (`scripts/ads_passenger_travel_time_di.R:94-288`) as one plan:
  *
  *   region map join (J7) → per-leg travel-time 9-bin (F12+F19) →
  *   two aggregate branches over a shared persisted core — trips ⊕
  *   transfers folded into one pass, journeys (A11 re-bin of
  *   per-journey sums) — each at region ⊕ 'Overall' grain via GROUPING
  *   SETS (A9) → ONE full-outer join (J8) → ordered output (O2). (The
  *   reference's shape — join at region grain, re-aggregate the joined
  *   result for 'Overall', union — would run the join subtree twice.)
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
    val wOrd = Window.partitionBy(col("user_id"), col("day"))
      .orderBy(col("ts"), col("event_id"))
    // travel-time is the one pipeline that KEEPS unmatched routes
    // (reported under the 'Unknown' region)
    val legs = EventDims.cleanedEvents(s, dir, keepUnknown = true)
      .withColumn("travel_us", round(col("value") * 60000000L).cast("long"))
      .withColumn("time_range_type", TimeOps.timeRangeBin(col("value")))
      .withColumn("leg_id", row_number().over(wOrd))
      // narrow BEFORE caching: the three consumers need 6 columns; the
      // wide row (raw event cols incl. the props JSON) roughly doubles
      // the cache build + scan cost for bytes nothing reads
      .select(col("day"), col("region_id"), col("user_id"),
        col("time_range_type"), col("travel_us"), col("leg_id"))
      .transform(graft.core.Caching.eager)

    val keys = Seq("ope_date", "time_range_type", "region_id")

    // Region ⊕ 'Overall' grains come out of ONE GROUPING SETS pass per
    // branch (the reference re-aggregates the joined result and unions —
    // `...travel_time_di.R:246-268` — which would execute the whole
    // join subtree twice here), then ONE full-outer join aligns the two
    // branches at both grains.
    //
    // trips and transfers group by the SAME keys (the reference bins
    // transfer legs by the leg's own travel time — `...travel_time_di
    // .R:181-193`), so both fold into one aggregation pass; a
    // conditional count stands in for the reference's filtered copy.
    // A transfer leg is any non-first leg — `leg_id > 1` alone; the
    // reference's extra `n_legs > 1` guard is implied (a row_number
    // above 1 means the partition has >1 row), so the whole-partition
    // count window it would cost is dropped.
    val regionKeys = Seq(col("ope_date"), col("time_range_type"), col("region_id"))
    val tripsTransfers = legs
      .withColumnRenamed("day", "ope_date")
      .groupingSets(Seq(regionKeys, regionKeys.init), regionKeys: _*)
      .agg(count(lit(1)).as("passenger_trips_num"),
        sum(when(col("leg_id") > 1, 1L).otherwise(0L)).as("transfer_raw"))
      .withColumn("region_id", coalesce(col("region_id"), lit("Overall")))

    val journeys = legs
      .groupBy(col("day").as("ope_date"), col("user_id"), col("region_id"))
      .agg(sum(col("travel_us")).as("journey_us"))
      .withColumn("time_range_type", TimeOps.timeRangeBinUs(col("journey_us")))
      .groupingSets(Seq(regionKeys, regionKeys.init), regionKeys: _*)
      .agg(count(lit(1)).as("journey_num"))
      .withColumn("region_id", coalesce(col("region_id"), lit("Overall")))

    // NULL-vs-zero semantics differ by grain (the R rbind writes NA on
    // regional rows, while the 'Overall' re-aggregation zero-fills
    // `sum(na.rm=T)`): regional transfer_num is NULL when no transfer
    // leg exists and regional trips/journeys stay NULL where the
    // full-outer finds no partner; Overall rows zero-fill everything.
    val overall = col("region_id") === "Overall"
    tripsTransfers
      .join(journeys, keys, "full_outer")
      .select(col("ope_date"), col("time_range_type"), col("region_id"),
        when(overall, coalesce(col("passenger_trips_num"), lit(0L)))
          .otherwise(col("passenger_trips_num")).as("passenger_trips_num"),
        when(overall, coalesce(col("journey_num"), lit(0L)))
          .otherwise(col("journey_num")).as("journey_num"),
        when(overall, coalesce(col("transfer_raw"), lit(0L)))
          .otherwise(nullif(col("transfer_raw"), lit(0L))).as("transfer_num"))
      .orderBy(col("ope_date"), col("time_range_type"), col("region_id"))
  }
}
