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
    val cutoffTs = lit(cutoff).cast("timestamp")

    val wOrd = Window.partitionBy(col("user_id"), col("day"))
      .orderBy(col("ts"), col("event_id"))
    val legs = EventDims.cleanedEvents(s, dir)
      .withColumn("distance_type", TimeOps.distanceBin(col("value") / 1000.0))
      .withColumn("leg_id", row_number().over(wOrd))
      .select(col("day"), col("region_id"), col("distance_type"),
        col("leg_id"), col("ts"))

    // ONE GROUPING SETS pass: the prior snapshot's key set folds into
    // the same aggregation as a max(pre-cutoff) flag — an output key
    // (base or overall grain) existed in the prior run iff any of its
    // rows predate the cutoff, which is exactly what aggregating the
    // filtered legs separately computed. The previous form ran a second
    // Expand + shuffle over the filtered legs and left-joined the key
    // sets back (plus a cache to feed both passes) — three extra
    // shuffles and ~8 Spark jobs for one boolean per output row.
    val current = Rollups.withOverall(
      legs.withColumnRenamed("day", "t_date"),
      keepCols = Seq(col("t_date"), col("distance_type")),
      overallCol = "region_id", overallLabel = "overall",
      aggs = Seq(
        count(lit(1)).as("passenger_trips_num"),
        sum(when(col("leg_id") === 1, 1L).otherwise(0L)).as("journey_num"),
        sum(when(col("leg_id") =!= 1, 1L).otherwise(0L)).as("transfer_num"),
        max(when(col("ts") < cutoffTs, 1).otherwise(0)).as("__seen_prior")))

    // both audit watermarks (prior run's data watermark = stored
    // create_time; current max ts = update_time) in ONE events scan —
    // previously two separate broadcast scans
    val wm = broadcast(ev.agg(
      date_format(max(col("ts")), "yyyy-MM-dd HH:mm:ss").as("now_ts"),
      date_format(max(when(col("ts") < cutoffTs, col("ts"))),
        "yyyy-MM-dd HH:mm:ss").as("prev_ts")))

    current
      .crossJoin(wm)
      .select(
        col("t_date"), lit("day").as("date_type"),
        col("region_id"), col("distance_type"),
        col("transfer_num"), col("journey_num"), col("passenger_trips_num"),
        lit("system").as("create_by"), lit("system").as("update_by"),
        when(col("__seen_prior") === 1, coalesce(col("prev_ts"), col("now_ts")))
          .otherwise(col("now_ts")).as("create_time"),
        col("now_ts").as("update_time"))
      .orderBy(col("t_date"), col("region_id"), col("distance_type"))
  }
}
