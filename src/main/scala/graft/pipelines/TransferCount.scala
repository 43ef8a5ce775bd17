package graft.pipelines

import graft.core.Tables
import graft.ops.Rollups
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
  * The reference's `counts[leg]` counts legs at that position BY THE
  * LEG'S OWN REGION, so within one region the sequence is NOT a true
  * survival curve — a journey whose later legs sit in another region
  * makes counts[k+1] > counts[k] possible, and the reference's
  * `journey_num >= 0` filter (`...transfer_count_di.py:230-233`)
  * genuinely drops those negative diffs rather than guarding a
  * can't-happen case. Mirrored exactly (filter, not clamp).
  * Fixture mapping matches q39/q40 (journey = user-day; audit time =
  * deterministic data watermark).
  */
object TransferCount {

  def adsTransferCountDaily(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)

    val wOrd = Window.partitionBy(col("user_id"), col("day"))
      .orderBy(col("ts"), col("event_id"))
    val legs = EventDims.cleanedEvents(s, dir)
      .withColumn("leg_id", row_number().over(wOrd))

    // A6 at (day × region ⊕ overall) in one pass
    val hist = Rollups.withOverall(legs.withColumnRenamed("day", "t_date"),
      keepCols = Seq(col("t_date"), col("leg_id")), overallCol = "region_id",
      overallLabel = "overall",
      aggs = Seq(count(lit(1)).as("cnt")))
      .transform(graft.core.Caching.eager)

    // transfer_cnt_type 0 .. max(6, max leg)-1 per (day, region): one
    // slot PAST the output domain so the lead() sees the count at leg
    // max_leg on the last emitted row; the extra slot is dropped after
    // the diff. One left join densifies the histogram, then the A7
    // difference counts[k+1]−counts[k+2] runs as a lead over the tiny
    // aggregated spine — the same algebra the reference runs as two
    // positional lookups (`...transfer_count_di.py:213-244`), one hist
    // join cheaper. NOT `Rollups.survivalDiff`: its clamp-at-0 would
    // keep rows the reference's `>= 0` filter DROPS — negatives are
    // real here because the histogram groups by the LEG's region, and
    // a journey whose later legs sit in a different region makes
    // counts non-monotone within one region (measured: 11 dropped
    // rows at sf0.01).
    val spine = hist.groupBy(col("t_date"), col("region_id"))
      .agg(greatest(lit(6), max(col("leg_id"))).as("max_leg"))
      .select(col("t_date"), col("region_id"), col("max_leg"),
        explode(sequence(lit(0), col("max_leg") - 1)).as("transfer_cnt_type"))

    val padded = spine
      .join(hist.as("h"),
        spine("t_date") === col("h.t_date") &&
        spine("region_id") === col("h.region_id") &&
        col("h.leg_id") === col("transfer_cnt_type") + 1, "left")
      .select(spine("t_date"), spine("region_id"), col("max_leg"),
        col("transfer_cnt_type"), coalesce(col("h.cnt"), lit(0L)).as("cnt"))

    val audit = broadcast(ev.agg(
      date_format(max(col("ts")), "yyyy-MM-dd HH:mm:ss").as("audit_ts")))

    val wLead = Window.partitionBy(col("t_date"), col("region_id"))
      .orderBy(col("transfer_cnt_type"))
    padded
      .withColumn("journey_num",
        col("cnt") - coalesce(lead(col("cnt"), 1).over(wLead), lit(0L)))
      .where(col("transfer_cnt_type") <= col("max_leg") - 2 &&
        col("journey_num") >= 0)
      .select(col("t_date"), lit("day").as("date_type"), col("region_id"),
        col("transfer_cnt_type"), col("journey_num"))
      .crossJoin(audit)
      .select(col("t_date"), col("date_type"), col("region_id"),
        col("transfer_cnt_type"), col("journey_num"),
        lit("system").as("create_by"), lit("system").as("update_by"),
        col("audit_ts").as("create_time"), col("audit_ts").as("update_time"))
      .orderBy(col("t_date"), col("region_id"), col("transfer_cnt_type"))
  }
}
