package graft.pipelines

import graft.core.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** `dim_date_info` — the calendar dimension the reference's data
  * inventory documents (docs/ads_all_20250804.csv: t_date, t_year,
  * t_month, t_day, week_id, quarter, week_day 1=Mon..7=Sun, week
  * from/to dates, is_workday, holiday_fid with -99 = non-holiday,
  * audit columns) and every `day_type` join in the scripts presumes.
  * No script builds it — generated here from the fact table's date
  * span: one `sequence()` explode, all derivations from built-in
  * calendar functions (F9-F14 family).
  *
  * Conventions preserved: week_day is ISO (Monday=1); from_date/
  * to_date are that ISO week's Monday/Sunday; is_workday = Mon-Fri
  * (the fixture has no holiday feed, so holiday_fid is the documented
  * -99 sentinel everywhere and holidays do not flip is_workday).
  */
object DimDate {

  def dimDateInfo(s: SparkSession, dir: String): DataFrame = {
    val span = Tables.events(s, dir)
      .agg(to_date(min(col("ts"))).as("d0"), to_date(max(col("ts"))).as("d1"),
        date_format(max(col("ts")), "yyyy-MM-dd HH:mm:ss").as("audit_ts"))
    // ISO weekday via weekday(): 0=Mon..6=Sun
    val wd = weekday(col("d"))
    span.select(explode(sequence(col("d0"), col("d1"))).as("d"), col("audit_ts"))
      .select(
        date_format(col("d"), "yyyy-MM-dd").as("t_date"),
        year(col("d")).as("t_year"),
        month(col("d")).as("t_month"),
        dayofmonth(col("d")).as("t_day"),
        weekofyear(col("d")).as("week_id"),
        quarter(col("d")).as("quarter"),
        (wd + 1).as("week_day"),
        date_format(date_sub(col("d"), wd), "yyyy-MM-dd").as("from_date"),
        date_format(date_add(col("d"), lit(6) - wd), "yyyy-MM-dd").as("to_date"),
        when(wd <= 4, 1).otherwise(0).as("is_workday"),
        lit(-99).as("holiday_fid"),
        lit("system").as("create_by"), lit("system").as("update_by"),
        col("audit_ts").as("create_time"), col("audit_ts").as("update_time"))
      .orderBy(col("t_date"))
  }
}
