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

  /** [[lineDim]] plus the global data watermark riding the SAME events
    * scan: the dim aggregation partitions ALL event rows (no filter),
    * so max over the per-group maxes == max(ts) over events — the
    * audit-timestamp agg (F15) that otherwise costs every pipeline a
    * second full events scan rides the dim's existing scan + shuffle
    * instead. The shared frame is dim-sized and eagerly cached; the
    * broadcast-join build and the audit row both read the cache.
    * Returns (dim without the helper column, 1-row audit frame). */
  def lineDimAndAudit(ev: DataFrame): (DataFrame, DataFrame) = {
    val d = graft.core.Caching.eager(
      ev.select(col("event_type").as("line_abbr"), col("ts"))
        .groupBy(Cleaning.deepClean(col("line_abbr")).as("line_clean"))
        .agg(min(col("line_abbr")).as("line_abbr"),
          max(col("ts")).as("__max_ts"))
        .withColumn("op_dep_no", length(col("line_abbr")) % 6))
    val audit = d.agg(
      date_format(max(col("__max_ts")), "yyyy-MM-dd HH:mm:ss").as("audit_ts"))
    (d.drop("__max_ts"), audit)
  }

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
                    keepUnknown: Boolean = false,
                    line: Option[DataFrame] = None): DataFrame = {
    val ev = Tables.events(s, dir)
    val base = ev
      .withColumn("route_clean", Cleaning.deepClean(col("event_type")))
      .join(broadcast(line.getOrElse(lineDim(ev))),
        col("route_clean") === col("line_clean"), "left")
      .join(broadcast(opDeptDim(s, dir)), Seq("op_dep_no"), "left")
      .withColumn("region_id", coalesce(col("region_name"), lit("Unknown")))
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
    if (keepUnknown) base else base.where(col("region_id") =!= "Unknown")
  }
}
