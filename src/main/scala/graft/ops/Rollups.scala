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
    // the discriminator column name is reserved — a caller column or
    // agg alias with the same name would be silently consumed by the
    // relabel/drop below (same guard shape as Skew.saltedInnerJoin)
    require(!df.columns.contains("__is_overall"),
      "withOverall reserves the column name __is_overall; rename the input column")
    require(!aggs.exists(a => org.apache.spark.sql.GraftSqlBridge.expression(a) match {
        case al: org.apache.spark.sql.catalyst.expressions.Alias => al.name == "__is_overall"
        case _ => false
      }),
      "withOverall reserves the agg alias __is_overall; use a different alias")
    val grouped = df.groupingSets(
      Seq(keepCols :+ col(overallCol), keepCols),
      (keepCols :+ col(overallCol)): _*)
    // discriminate rollup rows via grouping(), NOT NULL-ness: a genuine
    // NULL value of overallCol in the fine grain would otherwise also
    // be relabeled `overallLabel`, colliding with the rollup row and
    // breaking the "overall equals the sum of its groups" invariant
    val out = grouped.agg(aggs.head,
      (aggs.tail :+ grouping(col(overallCol)).as("__is_overall")): _*)
    out.withColumn(overallCol,
        when(col("__is_overall") === 1, lit(overallLabel))
          .otherwise(col(overallCol).cast("string")))
      .drop("__is_overall")
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
    * (daily numerator / daily denominator) / days-in-month, rounded
    * half-up to 4 decimals (`scripts/ads_passenger_travel_info_mi
    * .py:411-436`). Input is the daily aggregate carrying integer
    * `dayNum`/`dayDen` columns plus a days-in-month column; output one
    * row per (month grouping, keys).
    *
    * The whole fold runs in EXACT integer arithmetic
    * ([[Cleaning.halfUpScaledLong]] per day at 6 decimals, one integral
    * divide at the end): summing double quotients is order-dependent in
    * the last bit across partial-aggregation orders, which flips
    * rounding ties between engines — q15's and q39's measured defect
    * class. Deviation from the true rational per day ≤ 5e-7, far inside
    * the final 4-decimal rounding. den=0 days contribute 0 (F25). */
  def avgDailyRatio(daily: DataFrame, monthKeys: Seq[Column],
                    dayNum: Column, dayDen: Column, daysInMonth: Column,
                    outCol: String, extraAggs: Seq[Column] = Nil): DataFrame =
    daily
      .withColumn("__ratio_e6",
        when(dayDen > 0, Cleaning.halfUpScaledLong(dayNum, dayDen, 6))
          .otherwise(0L))
      .groupBy(monthKeys: _*)
      .agg(Cleaning.roundHalfUpRatio(
          sum(col("__ratio_e6")), max(daysInMonth).cast("long") * 100L, 4)
        .as(outCol), extraAggs: _*)

  /** MERGEABLE distinct-count rollup — the reference's HLL accumulator
    * contract (add/merge/count objects kept per key and merged across
    * chunks, `scripts/ads_passenger_travel_info_mi.py:266-270`),
    * restated on Spark's built-in Datasketches HLL columns:
    * `sketchDistinct` materializes per-fine-grain sketches (storable as
    * BINARY alongside the aggregate), `mergeSketches` unions them up to
    * a coarser grain WITHOUT rescanning facts — the property plain
    * `approx_count_distinct` lacks (its partial state dies inside one
    * aggregation). At 100 TB this is how daily ads tables roll up to
    * monthly uniques from the daily AGGREGATES instead of a second
    * fact-table pass.
    */
  def sketchDistinct(df: DataFrame, keys: Seq[Column], valueCol: Column,
                     sketchCol: String, lgConfigK: Int = 14): DataFrame =
    df.groupBy(keys: _*)
      .agg(hll_sketch_agg(valueCol, lit(lgConfigK)).as(sketchCol))

  /** Merge fine-grain sketches to `coarseKeys`, yielding the estimated
    * distinct count (exactly what a second HLL pass over raw facts at
    * the coarse grain would estimate, by sketch mergeability). */
  def mergeSketches(sketches: DataFrame, coarseKeys: Seq[Column],
                    sketchCol: String, outCol: String): DataFrame =
    sketches.groupBy(coarseKeys: _*)
      .agg(hll_sketch_estimate(hll_union_agg(col(sketchCol))).as(outCol))
}
