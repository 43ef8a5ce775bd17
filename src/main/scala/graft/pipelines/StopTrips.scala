package graft.pipelines

import graft.core.Tables
import graft.ops.Journeys
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** EP2 — `ads_stop_passenger_trips_di`
  * (`scripts/ads_stop_passenger_trips_di - first 6 months
  * 2025.py:28-100`) as one plan:
  *
  *   station filter (P5 two-condition) → station-date spine (A10/U1,
  *   union + distinct of boarding and alighting pairs) → four count
  *   aggregates — boards, alights, journey boards (leg 1), journey
  *   alights (W4 descending row_number last-leg pick) — → 4-way
  *   left-join merge chain onto the spine with zero-fill (J5/P8) →
  *   AVM day-type broadcast join deduped by date (J6/U5) → output.
  *
  * The reference's literal 4-join merge chain is kept ON PURPOSE: q08
  * carries the collapsed one-aggregation form SURVEY.md §7 prefers at
  * scale; this pipeline exercises the composition shape itself (each
  * join is a small aggregate — at 100 TB all four broadcast).
  *
  * Fixture mapping: station ids derive from event ids
  * (start = event_id % 50, end = (event_id·7+3) % 50; station 0 plays
  * the reference's `'-'` missing marker), journey = (user, day),
  * day-type dim = distinct dates labeled weekday/weekend.
  */
object StopTrips {

  def adsStopTripsDaily(s: SparkSession, dir: String): DataFrame = {
    // Seven downstream branches (spine×2, boards, alights, journey
    // boards/alights, day-type dim) consume this projection — eagerly
    // materialized (narrowed to the six columns used) so the scan +
    // filter run once instead of once per concurrent branch stage.
    val ev = graft.core.Caching.eager(Tables.events(s, dir)
      .withColumn("date", date_format(col("ts"), "yyyy-MM-dd"))
      .withColumn("start_station_no", col("event_id") % 50)
      .withColumn("end_station_no", (col("event_id") * 7 + 3) % 50)
      .where(col("start_station_no") =!= 0 && col("end_station_no") =!= 0)
      .select(col("date"), col("start_station_no"), col("end_station_no"),
        col("user_id"), col("ts"), col("event_id")))

    val spine = ev.select(col("date"), col("start_station_no").as("station_no"))
      .union(ev.select(col("date"), col("end_station_no").as("station_no")))
      .distinct()

    val boards = ev.groupBy(col("date"), col("start_station_no").as("station_no"))
      .agg(count(lit(1)).as("trip_board_num"))
    val alights = ev.groupBy(col("date"), col("end_station_no").as("station_no"))
      .agg(count(lit(1)).as("trip_alight_num"))

    val w = Journeys.orderedWindow(
      Seq(col("user_id"), col("date")), Seq(col("ts"), col("event_id")))
    val legs = ev.withColumn("leg_id", row_number().over(w))
    val journeyBoards = legs.where(col("leg_id") === 1)
      .groupBy(col("date"), col("start_station_no").as("station_no"))
      .agg(count(lit(1)).as("journey_board_num"))
    val lastLegs = Journeys.lastRowPerGroup(ev,
      Seq(col("user_id"), col("date")), unix_micros(col("ts")), col("event_id"))
    val journeyAlights = lastLegs
      .groupBy(col("date"), col("end_station_no").as("station_no"))
      .agg(count(lit(1)).as("journey_alight_num"))

    val dayType = ev.select(col("date")).distinct()
      .withColumn("day_type",
        when(weekday(to_date(col("date"))) >= 5, "weekend").otherwise("weekday"))

    spine
      .join(boards, Seq("date", "station_no"), "left")
      .join(alights, Seq("date", "station_no"), "left")
      .join(journeyBoards, Seq("date", "station_no"), "left")
      .join(journeyAlights, Seq("date", "station_no"), "left")
      // dayType is distinct-by-date by construction — no re-dedup
      .join(broadcast(dayType), Seq("date"), "left")
      .select(
        col("station_no").as("stop_no"),
        col("date").as("t_date"),
        lit("day").as("date_type"),
        coalesce(col("trip_board_num"), lit(0L)).as("trip_board_num"),
        coalesce(col("trip_alight_num"), lit(0L)).as("trip_alight_num"),
        coalesce(col("journey_board_num"), lit(0L)).as("journey_board_num"),
        coalesce(col("journey_alight_num"), lit(0L)).as("journey_alight_num"),
        col("day_type"))
      .orderBy(col("t_date"), col("stop_no"))
  }
}
