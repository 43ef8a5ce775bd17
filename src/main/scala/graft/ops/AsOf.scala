package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** As-of join — each left row matched to the single right row with the
  * greatest `rightTime` <= `leftTime` for the same keys (the
  * versioned-dimension lookup: "which fare policy / route revision /
  * exchange rate was in force when this event happened"). Spark has no
  * native operator for it; the naive restatement (join on key +
  * time-range filter + row_number) explodes to |versions| copies of
  * every event before pruning.
  *
  * Shape here: UNION the two sides and take a running
  * `last(payload, ignoreNulls)` window per key ordered by time — one
  * shuffle + one sort, no row multiplication, both sides arbitrarily
  * large (the at-scale shape; a per-key sort is exactly what the
  * sort-merge machinery does anyway). The right payload travels as ONE
  * struct so a version whose payload FIELD is legitimately NULL cannot
  * be skipped over by ignoreNulls — the struct itself is never null on
  * version rows. Ties (a version timestamped exactly at the event)
  * apply to that event: version rows order before event rows at equal
  * time.
  *
  * Parallelism = key cardinality: the window sorts per key, so a
  * low-cardinality key set (a handful of routes) caps the sort at that
  * many tasks. That is the honest cost of any per-key ordered
  * operator; for genuinely hot single keys, pre-bucket the left side
  * by time range and replicate only the bracketing versions per bucket
  * (the salting idea from [[Skew]]) before calling this.
  */
object AsOf {

  /** @param how "inner" drops left rows with no version at or before
    *            their time; "left" keeps them with NULL payload fields. */
  def asOfJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTime: String, rightTime: String,
               how: String = "inner"): DataFrame = {
    require(how == "inner" || how == "left", s"how must be inner|left, got $how")
    val reserved = Seq("__t", "__is_right", "__payload", "__v")
    val leftOnly = left.columns.filterNot(c => keys.contains(c) || c == leftTime)
    val payload = right.columns.filterNot(c => keys.contains(c) || c == rightTime)
    require(payload.nonEmpty, "right side has no payload columns")
    // the OUTPUT emits keys ++ leftTime ++ leftOnly ++ payload, so the
    // payload may not collide with ANY of the left-side output names —
    // including leftTime itself (a right column named like the event
    // time would silently duplicate the output column)
    val clash = (leftOnly.toSet + leftTime) intersect payload.toSet
    require(clash.isEmpty,
      s"rename columns present on both sides before asOfJoin: ${clash.mkString(", ")}")
    require(!(left.columns ++ right.columns).exists(reserved.contains),
      s"asOfJoin reserves ${reserved.mkString(", ")}; rename them on the input")

    val payloadType = StructType(payload.map(right.schema(_)))
    val l2 = left.select(
      keys.map(col) ++ Seq(col(leftTime).as("__t")) ++ leftOnly.map(col) ++
        Seq(lit(null).cast(payloadType).as("__payload"),
            lit(0).as("__is_right")): _*)
    // join semantics: a NULL never matches — a version with NULL
    // valid_from or a NULL key would otherwise sort NULLS FIRST into
    // "in force since forever" / pair up with NULL-key events, where
    // the equivalent join (and DuckDB's native ASOF) matches neither
    val r2 = right
      .where((keys.map(col(_).isNotNull) :+ col(rightTime).isNotNull)
        .reduce(_ && _))
      .select(
        keys.map(col) ++ Seq(col(rightTime).as("__t")) ++
          leftOnly.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
          Seq(struct(payload.map(col): _*).as("__payload"),
              lit(1).as("__is_right")): _*)

    // at equal __t the version row (is_right=1) sorts FIRST so the
    // event row's running last() already sees it
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").asc, col("__is_right").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = l2.union(r2)
      .withColumn("__v", last(col("__payload"), ignoreNulls = true).over(w))
      .where(col("__is_right") === 0)

    val kept = if (how == "inner") matched.where(col("__v").isNotNull) else matched
    kept.select(
      keys.map(col) ++ Seq(col("__t").as(leftTime)) ++ leftOnly.map(col) ++
        payload.map(c => col(s"__v.$c").as(c)): _*)
  }
}
