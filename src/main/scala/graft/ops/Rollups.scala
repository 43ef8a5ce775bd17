package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Aggregation patterns beyond plain groupBy (SURVEY.md §2.4). */
object Rollups {

  /** A9 "overall" rollup: every group-level aggregate is also produced
    * with one dimension collapsed to a literal label (the reference
    * re-runs each aggregation without `region_id` and unions —
    * `scripts/ads_passenger_travel_info_mi.py:316-342`).
    *
    * One-pass implementation via GROUPING SETS: a single shuffle
    * produces both grains (Spark expands the sets map-side), versus the
    * reference's two full passes. The column named `overallCol` is
    * replaced by `overallLabel` on the collapsed rows (taken as a name,
    * not a Column — expression-valued columns have no recoverable
    * output name).
    */
  def withOverall(df: DataFrame, keepCols: Seq[Column], overallCol: String,
                  overallLabel: String, aggs: Seq[Column]): DataFrame = {
    val grouped = df.groupingSets(
      Seq(keepCols :+ col(overallCol), keepCols),
      (keepCols :+ col(overallCol)): _*)
    val out = grouped.agg(aggs.head, aggs.tail: _*)
    out.withColumn(overallCol,
      coalesce(col(overallCol).cast("string"), lit(overallLabel)))
  }

  /** A7 survival-difference histogram: given per-(keys, ordinal) counts
    * over a dense ordinal domain (leg_id), journeys with exactly k legs
    * = count(ordinal k) − count(ordinal k+1), clamped at 0
    * (`scripts/ads_passenger_transfer_count_di.py:213-244`).
    *
    * Input must already be aggregated to one row per (keys, ordinal);
    * the `lead` runs over a window partitioned by `keys` ordered by
    * `ordinal` — a small post-aggregation shuffle.
    */
  def survivalDiff(counts: DataFrame, keys: Seq[Column], ordinal: Column,
                   cnt: Column, outCol: String): DataFrame = {
    val w = Window.partitionBy(keys: _*).orderBy(ordinal)
    counts.withColumn(outCol,
      greatest(cnt - coalesce(lead(cnt, 1).over(w), lit(0L)), lit(0L)))
  }

  /** A15 two-granularity fold: monthly metric = sum over days of
    * (daily numerator / daily denominator) / days-in-month
    * (`scripts/ads_passenger_travel_info_mi.py:411-436`). Input is the
    * daily aggregate; output one row per (month grouping, keys).
    */
  def avgDailyRatio(daily: DataFrame, monthKeys: Seq[Column],
                    dayRatio: Column, daysInMonth: Column, outCol: String): DataFrame =
    daily.groupBy(monthKeys: _*)
      .agg((sum(dayRatio) / first(daysInMonth)).as(outCol))
}
