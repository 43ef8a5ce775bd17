package graft.pipelines

import graft.core.Tables
import graft.ops.Cleaning
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** EP2 — `ads_ridership_passenger_trips_di`
  * (`scripts/ads_ridership_passenger_trips_di - first 6 months
  * 2025.py:82-190`) as one plan:
  *
  *   per-(date, route) trip counts (A1) ⟕ leg-1 journey counts with
  *   zero-fill (J3/P8) → service-type dim join with post-join manual
  *   fixups (J4: the reference overwrites the ADL rows' region after
  *   the join — mirrored as a route-keyed overwrite) → composite
  *   region×type service dispatch (F21, codegen'd when-chain, no
  *   row-apply) → second-level aggregation by service type (A8/A3).
  *
  * Fixture mapping matches the other pipelines (route=event_type,
  * journey=(user, day)); the service-type attribute derives from the
  * route key (length % 3 → Link/Regional/Local) and the 'error' route
  * plays the reference's ADL manual-fixup row.
  */
object Ridership {

  def adsRidershipDaily(s: SparkSession, dir: String): DataFrame = {
    // eager-cached (the repo's fan-out rule): three consumers of one
    // action — the daily counts, the journey window, and the dim
    // distinct — would each re-scan the fact table otherwise
    val ev = Tables.events(s, dir)
      .select(col("ts"), col("user_id"), col("event_id"),
        col("event_type"),
        date_format(col("ts"), "yyyy-MM-dd").as("t_date"),
        col("event_type").as("route"))
      .transform(graft.core.Caching.eager)

    val daily = ev.groupBy(col("t_date"), col("route"))
      .agg(count(lit(1)).as("passenger_trips"))

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"), col("t_date"))
      .orderBy(col("ts"), col("event_id"))
    val leg1 = ev.withColumn("leg_id", row_number().over(w))
      .where(col("leg_id") === 1)
      .groupBy(col("t_date"), col("route"))
      .agg(count(lit(1)).as("journey_trips"))

    val dim = ev.select(col("event_type").as("r")).distinct()
      .withColumn("op_dep_no", length(col("r")) % 6)
      .join(broadcast(Tables.region(s, dir)
          .select(col("r_regionkey").as("op_dep_no"), col("r_name").as("region"))),
        Seq("op_dep_no"), "left")
      .withColumn("stype",
        element_at(array(lit("Link"), lit("Regional"), lit("Local")),
          (length(col("r")) % 3 + 1).cast("int")))
      .select(col("r"), col("region"), col("stype"))

    daily
      .join(leg1, Seq("t_date", "route"), "left")
      .withColumn("journey_trips", coalesce(col("journey_trips"), lit(0L)))
      .join(broadcast(dim), col("route") === col("r"), "left")
      // J4 manual fixup: the reference overwrites ADL's region post-join
      .withColumn("region_fixed",
        when(col("route") === "error", "ASIA").otherwise(col("region")))
      .withColumn("service_type",
        Cleaning.serviceType(col("region_fixed"), col("stype")))
      .groupBy(col("t_date"), col("service_type"))
      .agg(
        countDistinct(col("route")).as("route_num"),
        sum(col("passenger_trips")).as("passenger_trips"),
        sum(col("journey_trips")).as("journey_trips"))
      .orderBy(col("t_date"), col("service_type"))
  }
}
