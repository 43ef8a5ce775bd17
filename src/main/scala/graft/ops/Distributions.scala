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

  /** Estimated fact-table bytes at or above which
    * [[discPercentilesBucketed]] caches its group-scaled frames
    * (bounds, located targets) instead of letting their subtrees —
    * each a full fact scan — recompute per reference. See the
    * dispatch comment in the method for the measured crossover. */
  val DistributionsCacheFactBytes: Long = 256L << 20

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
      // NULL measures are excluded from the rank domain (standard SQL
      // percentile semantics; keeps this form and the bucketed one
      // pick-for-pick identical on nullable inputs)
      .where(col("__dp_v").isNotNull)
      .withColumn("__dp_rn", row_number().over(w))
      .withColumn("__dp_n", count(lit(1)).over(wAll))
    val picks = percents.map { p =>
      val idx = Cleaning.intDiv(col("__dp_n") * p + 99, lit(100))
      max(when(col("__dp_rn") === idx, col("__dp_v"))).as(s"p$p")
    }
    ranked.groupBy(gcols: _*)
      .agg(max(col("__dp_n")).as("n"), picks: _*)
  }

  /** [[discPercentiles]] restated the way exact percentiles survive
    * 100 TB: the full-sort form above shuffles EVERY row into a
    * per-group sort whose parallelism is the group count — with few
    * groups it is a handful of single-threaded sorts of the whole
    * table (measured: 19× slower than the in-process oracle on a
    * 6-group table). This form never sorts the table, and (since
    * round 8) never ACCUMULATES group-scaled state on the driver —
    * every pass is a distributed aggregate whose group-scaled frames
    * (bounds, located targets) re-enter the plan as BROADCASTS, so
    * the driver only transits them (Spark's BroadcastExchange
    * collects the build side once) and fails loudly at the engine's
    * broadcast limits (~8 GB) rather than silently growing a
    * collect. The pass-2 histogram walk — the round-7 G×B driver
    * collect this rewrite removed — stays entirely executor-side:
    *
    *  1. one agg for per-group (min, max, n) — group-count rows,
    *     broadcast back onto the fact;
    *  2. one agg over fixed-width key buckets (group·B rows) whose
    *     per-group running total (a window over the TINY histogram,
    *     not the fact) locates, for each requested percentile rank,
    *     the bucket holding it and the rank REMAINING within it;
    *  3. one scan filtered to the target buckets (~n/B rows each)
    *     whose values sort per (group, bucket) — tiny — and a
    *     conditional aggregate picks the remaining-rank row.
    *
    * Buckets are assigned on a DERIVED long key that is monotone
    * non-decreasing in the measure (the identity for integral
    * measures; NaN-aware truncation for float/double), while the
    * within-bucket rank and the picked output value use the ORIGINAL
    * measure — so fractional measures are supported exactly and the
    * output column types match [[discPercentiles]]. Non-numeric
    * measures fail loudly (use [[discPercentiles]], which only needs
    * an ordering). Group columns may be ANY type including NULL
    * values: joins go through a null-safe composite key built
    * Spark-side on both ends, so there is no driver/executor
    * stringification parity to maintain.
    *
    * Exactness is unconditional — bucketing only NARROWS where each
    * order statistic lives; the final pick is positional within the
    * bucket, so ties behave exactly as in [[discPercentiles]] (every
    * rank position of a tie run holds the same value). Output is
    * column-identical to [[discPercentiles]]; the q64 oracle
    * hash-gates the equivalence corpus-wide. */
  def discPercentilesBucketed(df: DataFrame, groups: Seq[String],
                              value: Column, percents: Seq[Int],
                              buckets: Int = 1024,
                              cacheFactBytes: Long =
                                DistributionsCacheFactBytes): DataFrame = {
    import org.apache.spark.sql.types._
    require(percents.nonEmpty && percents.forall(p => p > 0 && p <= 100),
      s"percents must be in (0,100]: $percents")
    require(buckets >= 2, s"need at least 2 buckets: $buckets")
    val reserved = Set("__dp_v", "__dp_k", "__dp_b", "__dp_rn",
      "__gk", "__lo", "__hi", "__loc", "__w", "__n", "__c", "__cum",
      "__p", "__t", "__rw")
    require(df.columns.forall(c => !reserved.contains(c)),
      s"input already has a reserved column: " +
        df.columns.toSet.intersect(reserved))
    val gcols = groups.map(col)
    // Monotone derived bucket key. Truncation toward zero (Spark's
    // numeric→long cast) is monotone non-decreasing, so every value in
    // bucket b is ≤ every value in bucket b+1 and the histogram walk
    // below locates ranks correctly; the ORIGINAL value still decides
    // within-bucket order. Float/double: NaN sorts greatest in Spark
    // but casts to 0 — map it to Long.MaxValue; clamp ±9.0e18 keeps
    // the cast in Long range (monotone, ties resolved by value rank).
    val vType = df.select(value.as("__dp_v")).schema.head.dataType
    val keyExpr: Column = vType match {
      case _: ByteType | _: ShortType | _: IntegerType | _: LongType =>
        col("__dp_v").cast("long")
      case _: FloatType | _: DoubleType =>
        val v = col("__dp_v").cast("double")
        when(isnan(v), lit(Long.MaxValue)).otherwise(
          least(greatest(v, lit(-9.0e18)), lit(9.0e18)).cast("long"))
      case other => throw new IllegalArgumentException(
        s"discPercentilesBucketed: measure must be numeric (got " +
          s"${other.simpleString}); use discPercentiles for other " +
          "orderable types")
    }
    // Null-safe composite group key, built IN SPARK on both sides of
    // every join (no driver round-trip): NULL → \u0002, non-null →
    // 'v'+cast-to-string. NUL separator assumed absent from group
    // values (same caveat as any delimiter-composite key).
    val gkey: Column = concat_ws("\u0000", gcols.map(c =>
      coalesce(concat(lit("v"), c.cast("string")), lit("\u0002"))): _*)
    // NULL measures are excluded from the rank domain (standard SQL
    // percentile semantics; discPercentiles' window form matches)
    val keyed = df
      .select(gcols :+ value.as("__dp_v"): _*)
      .where(col("__dp_v").isNotNull)
      .withColumn("__dp_k", keyExpr)
      .withColumn("__gk", gkey)
    // pass 1 (distributed): per-group bounds; width computed in double
    // so extreme long ranges (hi−lo beyond Long.MaxValue) cannot
    // overflow — bucket ids only need monotone consistency, which the
    // double rounding preserves
    // SIZE-DISPATCHED caching of the group-scaled frames (r17):
    // `bounds` is group-count-sized but its subtree is a FULL fact
    // scan + aggregate, and it is referenced by `prepared` (itself
    // referenced by the pass-2 histogram AND the pass-3 candidate
    // scan) plus `targets` — uncached, the q64 plan carries 16 scans
    // of the fact table where the design needs 3 (bounds, histogram,
    // target buckets; same duplication for `wanted` below). Caching
    // costs two extra job barriers, so it engages only when the
    // fact's estimated bytes say a redundant scan outweighs a barrier
    // (≥ 256 MB): at sf0.1 (11 MB) the 16 pipelined-in-one-job scans
    // measured FASTER than 3 scans + 2 barriers (2.54 vs 3.11 s),
    // while at cluster scale 13 redundant full-table scans dwarf two
    // sub-second jobs. The estimate is the scan-relation size (file
    // bytes for parquet) — coarse is fine for a 25× threshold.
    val factBytes = scala.util.Try(
      df.queryExecution.optimizedPlan.stats.sizeInBytes
        .min(BigInt(Long.MaxValue)).toLong).getOrElse(Long.MaxValue)
    val cacheTiny = factBytes >= cacheFactBytes
    def tinyCache(f: DataFrame): DataFrame =
      if (cacheTiny) graft.core.Caching.eager(f) else f
    val bounds = tinyCache(keyed.groupBy(col("__gk"))
      .agg(min(col("__dp_k")).as("__lo"), max(col("__dp_k")).as("__hi"),
        count(lit(1)).as("__n"))
      .select(col("__gk"), col("__lo"), col("__n"),
        greatest(lit(1.0),
          (col("__hi").cast("double") - col("__lo").cast("double"))
            / buckets).as("__w")))
    // (tinyCache returns the frame unchanged below the byte floor)
    val prepared = keyed.join(broadcast(bounds), Seq("__gk"))
      .withColumn("__dp_b",
        floor((col("__dp_k").cast("double") - col("__lo").cast("double"))
          / col("__w")).cast("long"))
    // pass 2 (distributed): bucket histogram with per-group running
    // totals — the window runs over group·B histogram rows, never the
    // fact table
    val hist = prepared
      .groupBy(col("__gk"), col("__dp_b"))
      .agg(count(lit(1)).as("__c"))
      .withColumn("__cum", sum(col("__c")).over(
        Window.partitionBy(col("__gk")).orderBy(col("__dp_b"))))
    // each percentile's target rank per group (group·P rows), then the
    // smallest bucket whose running total reaches it + the rank
    // remaining within that bucket (1-based among its sorted rows)
    val targets = bounds
      .select(col("__gk"), col("__n"),
        explode(array(percents.map(lit): _*)).as("__p"))
      .withColumn("__t",
        Cleaning.intDiv(col("__n") * col("__p") + 99, lit(100)))
    // size-dispatched like `bounds` (group·P rows): referenced twice
    // below (the target-bucket restriction and the final pick join) —
    // uncached, each reference re-runs the histogram pass and its
    // fact scan
    val wanted = tinyCache(
      hist.join(broadcast(targets), Seq("__gk"))
      .where(col("__cum") >= col("__t"))
      .groupBy(col("__gk"), col("__p"))
      .agg(min_by(
        struct(col("__dp_b"),
          (col("__t") - (col("__cum") - col("__c"))).as("__rw")),
        col("__dp_b")).as("__loc"))
      .select(col("__gk"), col("__p"),
        col("__loc.__dp_b").as("__dp_b"), col("__loc.__rw").as("__rw")))
    // pass 3: only the target buckets sort — a per-(group, bucket)
    // window over ~n/B rows each
    val wantedB = broadcast(wanted)
    val cand = prepared
      .join(wantedB.select(col("__gk"), col("__dp_b")).distinct(),
        Seq("__gk", "__dp_b"))
      .withColumn("__dp_rn",
        row_number().over(Window.partitionBy(col("__gk"), col("__dp_b"))
          .orderBy(col("__dp_v"))))
    val pickCols = percents.map { p =>
      max(when(col("__p") === p, col("__dp_v"))).as(s"p$p")
    }
    cand
      .join(wantedB, Seq("__gk", "__dp_b"))
      .where(col("__dp_rn") === col("__rw"))
      .groupBy(gcols: _*)
      .agg(max(col("__n")).as("n"), pickCols: _*)
  }

}
