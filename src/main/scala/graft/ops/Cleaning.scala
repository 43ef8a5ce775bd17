package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Key-cleaning and categorical-dispatch expressions (SURVEY.md §2.8).
  *
  * All are pure `Column` expression builders — no UDFs — so they stay
  * inside WholeStageCodegen and remain usable in any plan position
  * (filter pushdown, join keys, aggregation keys).
  */
object Cleaning {

  /** F1 `deep_clean`: trim → keep only [A-Za-z0-9] → uppercase.
    * Reference behavior: `scripts/ads_passenger_travel_info_mi.py:145-148`.
    */
  def deepClean(c: Column): Column =
    upper(regexp_replace(trim(c), "[^A-Za-z0-9]", ""))

  /** F6: strip double quotes and trim (VDV field cleanup).
    * Reference behavior: `scripts/ads_passenger_transfer_count_di.py:88`. */
  def stripQuotes(c: Column): Column =
    trim(regexp_replace(c, "\"", ""))

  /** F2 `map_region_id`: dispatch on operating-department prefix.
    * Reference behavior: `scripts/ads_passenger_travel_info_mi.py:121-132`. */
  def regionFromPrefix(c: Column): Column =
    when(c.startsWith("AD"), "Abu Dhabi")
      .when(c.startsWith("ER"), "Al Ain")
      .when(c.startsWith("WR"), "Al Dhafra")
      .otherwise("Unknown")

  /** F3: region from the first digit of abs(OP_DEP_NO).
    * Reference behavior: `scripts/ads_passenger_travel_time_di.R:104-108`. */
  def regionFromOpDepNo(c: Column): Column = {
    val firstDigit = substring(abs(c).cast("string"), 1, 1)
    when(firstDigit === "1", "Abu Dhabi")
      .when(firstDigit === "2", "Al Ain")
      .when(firstDigit === "3", "Al Dhafra")
      .otherwise("Unknown")
  }

  /** F21 composite service-type dispatch (region × type → label).
    * Reference behavior: `scripts/ads_ridership_passenger_trips_di - first
    * 6 months 2025.py:129-148`. Expressed as a when-chain instead of a
    * row-apply UDF so it is codegen'd and constant-foldable.
    */
  def serviceType(region: Column, stype: Column): Column =
    when(region.isNull || stype.isNull, "Unknown")
      .when(stype === "Link", concat(region, lit(" Link")))
      .when(stype === "Regional", concat(region, lit(" Regional")))
      .otherwise(concat(region, lit(" Local")))

  /** F25 zero-guarded division (NaN-safe ratio metrics).
    * Reference behavior: `scripts/ads_passenger_travel_info_mi.py:442-445`. */
  def safeDiv(num: Column, den: Column): Column =
    when(den > 0, num / den).otherwise(lit(0.0))
}
