package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bucketed range (interval) join: match point rows to interval rows
  * with `start <= point <= end` WITHOUT a nested-loop or cartesian
  * plan.
  *
  * Spark plans a pure inequality join as BroadcastNestedLoopJoin (or
  * CartesianProduct when neither side fits in a broadcast) — O(|P|·|I|)
  * comparisons, the classic scale-killer for event-in-window analytics
  * (the reference's quarter-month slicing,
  * `scripts/ads_route_passenger_trips_di- first 6 months 2025.py:56-84`,
  * is a hand-rolled special case of this shape). The standard fix is
  * domain bucketing: pick a bucket width W, assign every point to the
  * single bucket `floor(point/W)`, explode every interval across the
  * buckets it overlaps (`floor(start/W) .. floor(end/W)`), equi-join on
  * the bucket id, then re-apply the exact range predicate. The join
  * becomes a shuffled hash/sort-merge equi-join whose cost is
  * O(|P| + Σ_i (len_i/W + 1)) rows shuffled plus only the per-bucket
  * candidate comparisons — the same plan shape Spark gives any groupBy.
  *
  * Correctness does not depend on W (every overlapping pair shares the
  * point's bucket exactly once, so there are no duplicates to dedupe
  * and no misses); ONLY performance does. Pick W ≈ the typical interval
  * length: much smaller explodes the interval side, much larger packs
  * too many candidates per bucket. Both sides shuffle on the bucket id,
  * so parallelism is the number of distinct populated buckets — at
  * 100 TB that is the time-domain width, not the row count, which is
  * exactly what you want for a time-windowed join.
  */
object RangeJoin {

  private val BucketCol = "__rj_bucket"

  /** Exact floor division that stays in Long for the full domain
    * (`floor(x/w)` through doubles loses exactness past 2^53):
    * `x - pmod(x, w)` is an exact multiple of w, so the truncating
    * IntegralDivide is exact for either sign. */
  private def floorDiv(x: Column, w: Long): Column =
    Cleaning.intDiv(x - pmod(x, lit(w)), lit(w))

  /** Join `points` to `intervals` on
    * `intervals(startCol) <= points(pointCol) <= intervals(endCol)`
    * (both bounds INCLUSIVE — pass `end - 1` for a half-open window).
    * All three columns must be integral (cast timestamps to epoch
    * days/seconds first; exactness of the bucket arithmetic is why the
    * API takes integers, not timestamps). Output columns are the point
    * columns followed by the interval columns; the two sides must not
    * share a column name.
    *
    * @param bucketWidth bucket width in the same units as the columns;
    *        intervals explode into `len/bucketWidth + 1` rows each.
    */
  def pointInInterval(points: DataFrame, pointCol: String,
                      intervals: DataFrame, startCol: String, endCol: String,
                      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    val clash = points.columns.toSet.intersect(intervals.columns.toSet)
    require(clash.isEmpty, s"point/interval column name clash: $clash")
    require(!points.columns.contains(BucketCol) && !intervals.columns.contains(BucketCol),
      s"input already has a $BucketCol column")

    val p = points.withColumn(BucketCol,
      floorDiv(col(pointCol).cast("long"), bucketWidth).cast("long"))
    // sequence() is inclusive on both ends — exactly the buckets the
    // closed interval overlaps. Intervals with start > end are empty by
    // definition and must produce no rows, not a descending sequence.
    val i = intervals
      .where(col(startCol) <= col(endCol))
      .withColumn(BucketCol, explode(sequence(
        floorDiv(col(startCol).cast("long"), bucketWidth).cast("long"),
        floorDiv(col(endCol).cast("long"), bucketWidth).cast("long"))))
    p.join(i, p(BucketCol) === i(BucketCol)
        && col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop(BucketCol)
  }
}
