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

    // audit watermark rides the line-dim scan (max over group maxes is
    // exact — lineDim partitions ALL rows) instead of a second full
    // events pass
    val (lineD, audit0) = EventDims.lineDimAndAudit(ev)

    val wOrd = Window.partitionBy(col("user_id"), col("day"))
      .orderBy(col("ts"), col("event_id"))
    val legs = EventDims.cleanedEvents(s, dir, line = Some(lineD))
      .withColumn("leg_id", row_number().over(wOrd))

    // A6 at (day × region ⊕ overall) in one pass
    val hist = Rollups.withOverall(legs.withColumnRenamed("day", "t_date"),
      keepCols = Seq(col("t_date"), col("leg_id")), overallCol = "region_id",
      overallLabel = "overall",
      aggs = Seq(count(lit(1)).as("cnt")))

    // Pad + A7 survival-difference fused into ONE aggregation: each
    // (day, region)'s sparse leg histogram collapses to a leg→cnt map
    // (leg positions are a bounded per-journey domain — a few entries,
    // never fact-sized), the dense transfer_cnt_type spine 0..max-2
    // explodes from a sequence, and journey_num = counts[k+1] −
    // counts[k+2] is two map lookups — the same algebra the reference
    // runs as two positional lookups (`...transfer_count_di.py:213-
    // 244`). The r6 shape ran this as a second groupBy + a 3-key
    // equality join back against a CACHED hist + a lead() window —
    // three more exchanges plus an eager-cache materialization action;
    // fusing makes hist single-consumer (no cache, no fan-out race)
    // and the whole tail one dim-sized shuffle. NOT
    // `Rollups.survivalDiff`: its clamp-at-0 would keep rows the
    // reference's `>= 0` filter DROPS — negatives are real here
    // because the histogram groups by the LEG's region, and a journey
    // whose later legs sit in a different region makes counts
    // non-monotone within one region (measured: 11 dropped rows at
    // sf0.01).
    val padded = hist.groupBy(col("t_date"), col("region_id"))
      .agg(
        map_from_entries(collect_list(struct(col("leg_id"), col("cnt"))))
          .as("m"),
        greatest(lit(6), max(col("leg_id"))).as("max_leg"))
      .select(col("t_date"), col("region_id"), col("m"),
        explode(sequence(lit(0), col("max_leg") - 2)).as("transfer_cnt_type"))
      .withColumn("journey_num",
        coalesce(element_at(col("m"), col("transfer_cnt_type") + 1), lit(0L)) -
        coalesce(element_at(col("m"), col("transfer_cnt_type") + 2), lit(0L)))
      .where(col("journey_num") >= 0)

    val audit = broadcast(audit0)

    padded
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
