package graft.pipelines

import graft.core.Tables
import graft.ops.{Cleaning, Rollups}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** EP2 — `ads_passenger_transfer_count_di`
  * (`scripts/ads_passenger_transfer_count_di.py:164-263`) as one plan:
  *
  *   clean keys → broadcast LINE/OP_DEPT joins → region filter (P4) →
  *   per-(day, region ⊕ overall) leg-id histogram (A6, one-pass
  *   GROUPING SETS) → pad the leg domain to ≥ 6 → survival-difference
  *   journeys-with-exactly-k-transfers (A7: counts[k+1] − counts[k+2])
  *   → non-negativity guard → audit columns (F15) → ordered output.
  *
  * The reference's `counts[leg]` = #legs with that leg_id = #journeys
  * with ≥ leg legs, so the survival differences are mathematically
  * non-negative; the `journey_num >= 0` filter is mirrored anyway
  * (`...transfer_count_di.py:230-233` keeps it as a guard).
  * Fixture mapping matches q39/q40 (journey = user-day; audit time =
  * deterministic data watermark).
  */
object TransferCount {

  def adsTransferCountDaily(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)

    val line = EventDims.lineDim(ev)
    val opDept = EventDims.opDeptDim(s, dir)

    val wOrd = Window.partitionBy(col("user_id"), col("day"))
      .orderBy(col("ts"), col("event_id"))
    val legs = ev
      .withColumn("route_clean", Cleaning.deepClean(col("event_type")))
      .join(broadcast(line), col("route_clean") === col("line_clean"), "left")
      .join(broadcast(opDept), Seq("op_dep_no"), "left")
      .withColumn("region_id", coalesce(col("region_name"), lit("Unknown")))
      .where(col("region_id") =!= "Unknown")
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
      .withColumn("leg_id", row_number().over(wOrd))

    // A6 at (day × region ⊕ overall) in one pass
    val hist = Rollups.withOverall(legs.withColumnRenamed("day", "t_date"),
      keepCols = Seq(col("t_date"), col("leg_id")), overallCol = "region_id",
      overallLabel = "overall",
      aggs = Seq(count(lit(1)).as("cnt")))
      .transform(graft.core.Caching.eager)

    // transfer_cnt_type 0 .. max(6, max leg)-2 per (day, region)
    val spine = hist.groupBy(col("t_date"), col("region_id"))
      .agg(greatest(lit(6), max(col("leg_id"))).as("max_leg"))
      .select(col("t_date"), col("region_id"),
        explode(sequence(lit(0), col("max_leg") - 2)).as("transfer_cnt_type"))

    val audit = broadcast(ev.agg(
      date_format(max(col("ts")), "yyyy-MM-dd HH:mm:ss").as("audit_ts")))

    spine
      .join(hist.as("h1"),
        spine("t_date") === col("h1.t_date") &&
        spine("region_id") === col("h1.region_id") &&
        col("h1.leg_id") === col("transfer_cnt_type") + 1, "left")
      .join(hist.as("h2"),
        spine("t_date") === col("h2.t_date") &&
        spine("region_id") === col("h2.region_id") &&
        col("h2.leg_id") === col("transfer_cnt_type") + 2, "left")
      .select(spine("t_date"), lit("day").as("date_type"), spine("region_id"),
        col("transfer_cnt_type"),
        (coalesce(col("h1.cnt"), lit(0L)) - coalesce(col("h2.cnt"), lit(0L)))
          .as("journey_num"))
      .where(col("journey_num") >= 0)
      .crossJoin(audit)
      .select(col("t_date"), col("date_type"), col("region_id"),
        col("transfer_cnt_type"), col("journey_num"),
        lit("system").as("create_by"), lit("system").as("update_by"),
        col("audit_ts").as("create_time"), col("audit_ts").as("update_time"))
      .orderBy(col("t_date"), col("region_id"), col("transfer_cnt_type"))
  }
}
