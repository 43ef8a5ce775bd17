package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact per-group discrete percentiles — the travel-time-distribution
  * shape (`docs/data glossary.xlsx` "Travel time" KPI rows describe
  * distribution summaries per day/region) made oracle-checkable.
  *
  * `percentile_approx` is the 100 TB default but its sketch output is
  * engine-specific; the EXACT discrete percentile (smallest value whose
  * 1-based rank reaches `ceil(p·n)`) is reproducible by any engine from
  * pure integer arithmetic, which makes it the verifier twin — same
  * role the exact Jaccard verifier plays for MinHash.
  *
  * One value-ordered window per group computes row_number + count; a
  * conditional aggregate then picks each percentile row. Cost: ONE
  * shuffle on the group keys and a per-group sort — the same plan any
  * per-group ranking takes. Ties: equal values may permute ranks, but
  * every rank position holds the same value, so the picked VALUE is
  * deterministic (this is why the op picks by position, not by
  * cume_dist comparison).
  */
object Distributions {

  /** @param percents integer percents in (0, 100], e.g. Seq(50, 90, 99);
    *                  output columns are named `p50`, `p90`, … plus `n`.
    *                  `ceil(p·n/100)` is computed as `(n·p + 99) div 100`
    *                  — integer-exact, no float ceil. */
  def discPercentiles(df: DataFrame, groups: Seq[String], value: Column,
                      percents: Seq[Int]): DataFrame = {
    require(percents.nonEmpty && percents.forall(p => p > 0 && p <= 100),
      s"percents must be in (0,100]: $percents")
    val reserved = Set("__dp_v", "__dp_rn", "__dp_n")
    require(df.columns.forall(c => !reserved.contains(c)),
      s"input already has a reserved column: ${df.columns.toSet.intersect(reserved)}")
    val gcols = groups.map(col)
    val w = Window.partitionBy(gcols: _*).orderBy(value)
    val wAll = Window.partitionBy(gcols: _*)
    val ranked = df
      .withColumn("__dp_v", value)
      .withColumn("__dp_rn", row_number().over(w))
      .withColumn("__dp_n", count(lit(1)).over(wAll))
    val picks = percents.map { p =>
      val idx = Cleaning.intDiv(col("__dp_n") * p + 99, lit(100))
      max(when(col("__dp_rn") === idx, col("__dp_v"))).as(s"p$p")
    }
    ranked.groupBy(gcols: _*)
      .agg(max(col("__dp_n")).as("n"), picks: _*)
  }
}
