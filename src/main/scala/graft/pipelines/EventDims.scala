package graft.pipelines

import graft.core.Tables
import graft.ops.Cleaning
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared broadcast dims the ads pipelines derive from the event fixture
  * (standing in for the reference's LINE / OP_DEPT tables, e.g.
  * `scripts/ads_passenger_travel_info_mi.py:380-420`).
  */
object EventDims {

  /** LINE dim (J1 with right-side dedup): cleaned key → deterministic
    * representative raw value → synthetic op_dep_no.
    *
    * One hash aggregation straight off the fact column — NOT
    * `.distinct().groupBy(...)`: `min` is duplicate-insensitive, so the
    * pre-distinct adds a full extra shuffle for nothing. Map-side
    * partial aggregation reduces each scan partition to its unique
    * cleaned keys before the single exchange, which is the shape that
    * survives a 100 TB fact scan (dim cardinality, not fact rows, cross
    * the wire).
    */
  def lineDim(ev: DataFrame): DataFrame =
    ev.select(col("event_type").as("line_abbr"))
      .groupBy(Cleaning.deepClean(col("line_abbr")).as("line_clean"))
      .agg(min(col("line_abbr")).as("line_abbr"))
      .withColumn("op_dep_no", length(col("line_abbr")) % 6)

  /** OP_DEPT → region-name dim (J2/J7 left side). */
  def opDeptDim(s: SparkSession, dir: String): DataFrame =
    Tables.region(s, dir)
      .select(col("r_regionkey").as("op_dep_no"), col("r_name").as("region_name"))

  /** The cleaned-leg prefix every AFC pipeline starts with (J1+J2+F1+
    * F2-shape+P4): deep_clean the route key → broadcast LINE join →
    * broadcast OP_DEPT join → region coalesce ('Unknown' for unmatched
    * routes, the reference's flow) → day column. ONE implementation —
    * four pipelines previously carried byte-identical private copies of
    * this block, where a fix to the join key or region rule had to be
    * replicated and a missed copy silently diverged. `keepUnknown`
    * keeps the unmatched-route rows (travel-time reports them as their
    * own region; the other pipelines filter them, `py:434-436`). */
  def cleanedEvents(s: SparkSession, dir: String,
                    keepUnknown: Boolean = false): DataFrame = {
    val ev = Tables.events(s, dir)
    val base = ev
      .withColumn("route_clean", Cleaning.deepClean(col("event_type")))
      .join(broadcast(lineDim(ev)), col("route_clean") === col("line_clean"), "left")
      .join(broadcast(opDeptDim(s, dir)), Seq("op_dep_no"), "left")
      .withColumn("region_id", coalesce(col("region_name"), lit("Unknown")))
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
    if (keepUnknown) base else base.where(col("region_id") =!= "Unknown")
  }
}
