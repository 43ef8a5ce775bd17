package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Temporal derivations and binning (SURVEY.md §2.8 F8-F19).
  * Pure expression builders — codegen-friendly, no UDFs.
  */
object TimeOps {

  /** F12: duration in minutes between two timestamps, sub-second precise
    * (pandas `total_seconds()/60` keeps fractions —
    * `scripts/ads_passenger_travel_info_mi.py:201`). Casting a timestamp
    * to double yields fractional epoch seconds.
    */
  def minutesBetween(start: Column, end: Column): Column =
    (end.cast("double") - start.cast("double")) / 60.0

  /** F10: year-month period label, e.g. "2025-03"
    * (`scripts/ads_passenger_travel_info_mi.py:239`). */
  def yearMonth(ts: Column): Column = date_format(ts, "yyyy-MM")

  /** F13: number of days in the month containing `d`
    * (`scripts/ads_passenger_travel_info_mi.py:346-361`). */
  def daysInMonth(d: Column): Column = dayofmonth(last_day(d))

  /** F14: quarter-month slice 1..4 (days 1-7 / 8-14 / 15-21 / 22-end).
    * The reference uses this as a manual partitioning artifact
    * (`scripts/ads_route_passenger_trips_di- first 6 months
    * 2025.py:62-76`); kept as an optional derived column only.
    */
  def quarterMonthPart(d: Column): Column = {
    val dom = dayofmonth(d)
    when(dom < 8, 1).when(dom < 15, 2).when(dom < 22, 3).otherwise(4)
  }

  /** F17: clamp to [lo, hi], out-of-range → `default`
    * (`scripts/ads_passenger_travel_info_mi.py:204-205`: negative or
    * >240-minute transfer gaps are zeroed, not truncated).
    */
  def clampOrElse(c: Column, lo: Double, hi: Double, default: Double): Column =
    when(c < lo || c > hi, lit(default)).otherwise(c)

  /** F18 distance bins (km): (0,5],(5,10],(10,15],(15,20],(20,inf),
    * include-lowest (`scripts/ads_passenger_travel_distance_di.py:210-220`);
    * null → "NA" like every other binner (a null would otherwise fall
    * through into the overflow label). */
  def distanceBin(km: Column): Column =
    when(km.isNull, "NA")
      .when(km <= 5, "0-5km")
      .when(km <= 10, "5-10km")
      .when(km <= 15, "10-15km")
      .when(km <= 20, "15-20km")
      .otherwise(">20km")

  /** F19 travel-time bins: nine ranges, "NA" fallback
    * (`scripts/ads_passenger_travel_time_di.R:140-151`). */
  def timeRangeBin(mins: Column): Column =
    when(mins.isNull, "NA")
      .when(mins <= 10, "0-10min")
      .when(mins <= 20, "10-20min")
      .when(mins <= 30, "20-30min")
      .when(mins <= 40, "30-40min")
      .when(mins <= 50, "40-50min")
      .when(mins <= 60, "50-60min")
      .when(mins <= 90, "60-90min")
      .when(mins <= 120, "90-120min")
      .otherwise(">120min")

  /** F19 in exact integer microseconds: same nine labels as
    * [[timeRangeBin]] with thresholds in µs — used where the binned
    * quantity is a SUM (journey travel time): long sums are
    * order-free-exact, so a value can never straddle a bin boundary
    * differently across engines the way double sums can. */
  def timeRangeBinUs(us: Column): Column = {
    val m = 60000000L // one minute in µs
    when(us.isNull, "NA")
      .when(us <= 10 * m, "0-10min")
      .when(us <= 20 * m, "10-20min")
      .when(us <= 30 * m, "20-30min")
      .when(us <= 40 * m, "30-40min")
      .when(us <= 50 * m, "40-50min")
      .when(us <= 60 * m, "50-60min")
      .when(us <= 90 * m, "60-90min")
      .when(us <= 120 * m, "90-120min")
      .otherwise(">120min")
  }

  /** F18/F19-style generic numeric binning: ascending upper bounds with
    * labels, last label is the overflow bucket; null → "NA" (matching
    * the sibling binners — a null would otherwise fall through every
    * `when` into the overflow label and silently misclassify). */
  def binByUpperBounds(c: Column, bounds: Seq[Double], labels: Seq[String]): Column = {
    require(labels.length == bounds.length + 1, "labels = bounds + overflow")
    val base: Column = lit(labels.last)
    val binned = bounds.zip(labels).reverse.foldLeft(base) { case (acc, (b, l)) =>
      when(c <= b, l).otherwise(acc)
    }
    when(c.isNull, "NA").otherwise(binned)
  }
}
