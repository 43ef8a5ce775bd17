package graft.pipelines

import graft.core.Tables
import graft.ops.{Rollups, TimeOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** EP1-family — `ads_passenger_travel_distance_di`
  * (`scripts/ads_passenger_travel_distance_di.py:154-330`) as one plan:
  *
  *   region joins + Unknown filter → m→km (F16) → include-lowest
  *   distance bins (F18) → (day × region ⊕ overall × distance bin)
  *   counts with journey/transfer splits (A1/A2, one-pass GROUPING
  *   SETS instead of the reference's two passes) → FIRST-SEEN
  *   create_time per output key (S17/ST4: the reference keeps a SQLite
  *   get-or-create store; here the prior run's snapshot joins back in
  *   and `coalesce(prev.create_time, now)` preserves first-seen
  *   semantics) → audit columns → ordered output.
  *
  * The "previous snapshot" is modeled deterministically as the same
  * aggregation over the first half of the event window (a prior daily
  * run), with its own data watermark as the stored create_time —
  * making the get-or-create contract oracle-checkable.
  */
object TravelDistance {

  private val cutoff = "2024-01-15"

  def adsTravelDistanceDaily(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)

    val wOrd = Window.partitionBy(col("user_id"), col("day"))
      .orderBy(col("ts"), col("event_id"))
    val legs = EventDims.cleanedEvents(s, dir)
      .withColumn("distance_type", TimeOps.distanceBin(col("value") / 1000.0))
      .withColumn("leg_id", row_number().over(wOrd))
      // narrow BEFORE caching (see TravelTime): consumers read 5 cols
      .select(col("day"), col("region_id"), col("distance_type"),
        col("leg_id"), col("ts"))
      .transform(graft.core.Caching.eager)

    def aggregate(df: DataFrame): DataFrame =
      Rollups.withOverall(df.withColumnRenamed("day", "t_date"),
        keepCols = Seq(col("t_date"), col("distance_type")),
        overallCol = "region_id", overallLabel = "overall",
        aggs = Seq(
          count(lit(1)).as("passenger_trips_num"),
          sum(when(col("leg_id") === 1, 1L).otherwise(0L)).as("journey_num"),
          sum(when(col("leg_id") =!= 1, 1L).otherwise(0L)).as("transfer_num")))

    val current = aggregate(legs)
    // prior run's snapshot: keys seen before the cutoff, stamped with
    // that run's data watermark (S17 get-or-create store contents)
    val prior = aggregate(legs.where(col("ts") < lit(cutoff).cast("timestamp")))
      .select(col("t_date"), col("distance_type"), col("region_id"))
      .crossJoin(broadcast(
        ev.where(col("ts") < lit(cutoff).cast("timestamp"))
          .agg(date_format(max(col("ts")), "yyyy-MM-dd HH:mm:ss").as("prev_ts"))))
    val nowTs = broadcast(ev.agg(
      date_format(max(col("ts")), "yyyy-MM-dd HH:mm:ss").as("now_ts")))

    current
      .join(prior, Seq("t_date", "distance_type", "region_id"), "left")
      .crossJoin(nowTs)
      .select(
        col("t_date"), lit("day").as("date_type"),
        col("region_id"), col("distance_type"),
        col("transfer_num"), col("journey_num"), col("passenger_trips_num"),
        lit("system").as("create_by"), lit("system").as("update_by"),
        coalesce(col("prev_ts"), col("now_ts")).as("create_time"),
        col("now_ts").as("update_time"))
      .orderBy(col("t_date"), col("region_id"), col("distance_type"))
  }
}
