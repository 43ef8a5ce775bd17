package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

/** Ordered-within-group (window) operators (SURVEY.md §2.5).
  *
  * The reference's journey semantics: AFC rows are legs; `(uid,
  * journey_id)` identifies a journey; `leg_id` orders legs. Both
  * last-leg definitions that appear in the reference are exposed
  * explicitly (SURVEY.md §7.4 risk 1) rather than silently unified.
  *
  * Scale note: each window is one shuffle on its partition keys. All
  * helpers take the partition/order columns as parameters so callers can
  * reuse one shuffle for several derivations (lead + lag + max share a
  * WindowSpec partitioning).
  */
object Journeys {

  def orderedWindow(partCols: Seq[Column], orderCols: Seq[Column]): WindowSpec =
    Window.partitionBy(partCols: _*).orderBy(orderCols: _*)

  /** W1: next row's value within the ordered group
    * (`scripts/ads_passenger_travel_info_mi.py:195-198`). */
  def nextInGroup(c: Column, w: WindowSpec): Column = lead(c, 1).over(w)

  /** W2: previous row's value within the ordered group
    * (`ads_passenger_travel_time_di.R:165-172`). */
  def prevInGroup(c: Column, w: WindowSpec): Column = lag(c, 1).over(w)

  /** W3: "is last leg" via group-max(leg_id) == leg_id
    * (`scripts/ads_passenger_travel_info_mi.py:209-210`). */
  def isGroupMax(c: Column, partCols: Seq[Column]): Column =
    c === max(c).over(Window.partitionBy(partCols: _*))

  /** W4: keep the last row per group by descending order key
    * (`ads_stop_passenger_trips_di...py:62-65`). `tieBreak` makes the
    * pick deterministic when the order key has duplicates.
    */
  def lastRowPerGroup(df: DataFrame, partCols: Seq[Column],
                      orderKey: Column, tieBreak: Column): DataFrame = {
    val w = Window.partitionBy(partCols: _*).orderBy(orderKey.desc, tieBreak.desc)
    df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .drop("__rn")
  }

  /** W6: transfer time = gap from this leg's end to next leg's start,
    * minutes, clamped to [0, 240] with out-of-range → 0, and 0 on the
    * last leg (no next) — `scripts/ads_passenger_travel_info_mi.py:201-210`.
    */
  def transferMinutes(endTime: Column, nextStart: Column): Column = {
    val gap = TimeOps.minutesBetween(endTime, nextStart)
    when(nextStart.isNull, 0.0)
      .otherwise(TimeOps.clampOrElse(gap, 0.0, 240.0, 0.0))
  }

  /** W6 in exact integer microseconds: same clamp semantics as
    * [[transferMinutes]] but computed in the integer domain
    * (`unix_micros`) so results are bit-deterministic across engines —
    * used by oracle-checked queries; pipelines keep the double-minutes
    * form the reference specifies.
    */
  def transferMicros(endTime: Column, nextStart: Column,
                     maxMinutes: Int = 240): Column = {
    val gapUs = unix_micros(nextStart) - unix_micros(endTime)
    val maxUs = maxMinutes.toLong * 60L * 1000000L
    when(nextStart.isNull, 0L)
      .when(gapUs < 0L || gapUs > maxUs, 0L)
      .otherwise(gapUs)
  }

  /** Sessionization: assign a session id per partition key where a new
    * session starts when the gap from the previous event exceeds
    * `gapMinutes`. Not in the reference (its journeys are pre-grouped by
    * journey_id) but the inverse operation — deriving journey ids from
    * raw taps — done the standard Spark way: lag → boundary flag →
    * running sum. One shuffle.
    *
    * The boundary compare runs in integer microseconds (`unix_micros`),
    * not double epoch-seconds — the repo's rule for oracle-checked time
    * arithmetic: a gap of exactly the threshold must classify
    * identically in both engines, which double rounding can't promise.
    */
  def sessionize(df: DataFrame, partCols: Seq[Column], ts: Column,
                 gapMinutes: Double, sessionCol: String): DataFrame = {
    val wOrd = Window.partitionBy(partCols: _*).orderBy(ts)
    val gapUs = unix_micros(ts) - unix_micros(prevInGroup(ts, wOrd))
    val thresholdUs = math.round(gapMinutes * 60d * 1e6)
    val isNew = when(gapUs.isNull || gapUs > thresholdUs, 1L).otherwise(0L)
    df.withColumn(sessionCol,
      sum(isNew).over(wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }
}
