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
    * 6-group table). This form never sorts the table:
    *
    *  1. one agg for per-group (min, max, n) — group-count rows;
    *  2. one agg over fixed-width value buckets — group·B rows; the
    *     driver accumulates each group's bucket histogram and locates,
    *     for every requested percentile rank, the bucket holding it
    *     and the rank REMAINING within that bucket (both bounded,
    *     dimension-sized collects);
    *  3. one scan filtered to the target buckets (~n/B rows each)
    *     whose values sort per (group, bucket) — tiny — and a
    *     conditional aggregate picks the remaining-rank row.
    *
    * Exactness is unconditional — bucketing only NARROWS where each
    * order statistic lives; the final pick is positional within the
    * bucket, so ties behave exactly as in [[discPercentiles]] (every
    * rank position of a tie run holds the same value). Output is
    * column-identical to [[discPercentiles]]; the q64 oracle
    * hash-gates the equivalence corpus-wide. */
  def discPercentilesBucketed(df: DataFrame, groups: Seq[String],
                              value: Column, percents: Seq[Int],
                              buckets: Int = 1024): DataFrame = {
    require(percents.nonEmpty && percents.forall(p => p > 0 && p <= 100),
      s"percents must be in (0,100]: $percents")
    require(buckets >= 2, s"need at least 2 buckets: $buckets")
    val sp = df.sparkSession
    import sp.implicits._
    val gcols = groups.map(col)
    // driver-side composite keys require that String.valueOf of the
    // collected JVM value equals Spark's cast-to-string per row —
    // true for strings, integrals and booleans, NOT for timestamps
    // ('...00:00:00.0' vs '...00:00:00'), dates pre-epoch, decimals
    // with trailing zeros, etc. Fail loudly rather than silently
    // joining nothing.
    locally {
      import org.apache.spark.sql.types._
      val ok: Set[DataType] = Set(StringType, IntegerType, LongType,
        ShortType, ByteType, BooleanType)
      val bad = df.schema.filter(f => groups.contains(f.name) &&
        !ok.contains(f.dataType))
      require(bad.isEmpty,
        s"discPercentilesBucketed: group column types must stringify " +
        s"identically on driver and executor; unsupported: " +
        bad.map(f => s"${f.name}:${f.dataType.simpleString}").mkString(","))
    }
    // composite key string (NUL separator cannot occur in sane group
    // values, so composite keys never alias). All per-row group
    // decisions below go through BROADCAST joins on this key — NOT
    // when-chain expressions: CollapseProject inlines a derived
    // column into every consumer, so a when-chain keyed on a concat
    // re-expands the whole CASE tree (×2 arithmetic operands ×18
    // filter terms) into one enormous per-row expression — measured
    // 7.3 s vs 0.9 s for the identical algorithm through joins.
    def gkey: Column = concat_ws("\u0000", gcols.map(_.cast("string")): _*)
    def gk(g: Seq[Any]): String = g.map(String.valueOf).mkString("\u0000")
    // NULL measures are excluded from the rank domain (standard SQL
    // percentile semantics; discPercentiles' window form matches)
    val keyed = df
      .select(gcols :+ value.cast("long").as("__dp_v"): _*)
      .where(col("__dp_v").isNotNull)
      .withColumn("__gk", gkey)
    // pass 1: per-group bounds — group-count rows to the driver
    val bounds = keyed.groupBy(gcols: _*)
      .agg(min(col("__dp_v")).as("lo"), max(col("__dp_v")).as("hi"),
        count(lit(1)).as("n"))
      .collect()
      .map { r =>
        val g = groups.indices.map(r.get).toSeq
        // a NULL group value would alias in the composite key (concat_ws
        // SKIPS nulls while the driver-side mkString prints them) and
        // silently route the group's rows to no bucket — fail loudly
        require(g.forall(_ != null),
          s"discPercentilesBucketed: NULL group values unsupported: $g")
        val lo = r.getLong(groups.length)
        val hi = r.getLong(groups.length + 1)
        val n = r.getLong(groups.length + 2)
        // ceil width so hi maps to bucket B-1
        g -> (lo, math.max(1L, (hi - lo) / buckets + 1), n)
      }.toMap
    val boundsDf = broadcast(
      bounds.toSeq.map { case (g, (lo, w, n)) => (gk(g), lo, w, n) }
        .toDF("__gk", "__lo", "__w", "__n"))
    val prepared = keyed.join(boundsDf, Seq("__gk"))
      .withColumn("__dp_b",
        Cleaning.intDiv(col("__dp_v") - col("__lo"), col("__w")))
    // pass 2: bucket histogram — group·B rows to the driver
    val hist = prepared
      .groupBy(col("__gk"), col("__dp_b"))
      .agg(count(lit(1)).as("c"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
      .map { case (g, rows) =>
        g -> rows.toSeq.map(t => (t._2, t._3)).sortBy(_._1)
      }
    // locate each percentile's bucket + remaining rank within it
    // (rankWithin is 1-based among the bucket's value-sorted rows)
    val wanted: Seq[(String, Long, Int, Long)] =
      bounds.toSeq.flatMap { case (g, (_, _, n)) =>
        val h = hist.getOrElse(gk(g), Seq.empty[(Long, Long)])
        percents.map { p =>
          val target = (n * p + 99) / 100
          var cum = 0L
          var found: Option[(Long, Long)] = None
          h.foreach { case (b, c) =>
            if (found.isEmpty && cum + c >= target)
              found = Some((b, target - cum))
            if (found.isEmpty) cum += c
          }
          val (b, rw) = found.getOrElse(
            (h.lastOption.map(_._1).getOrElse(0L), 1L))
          (gk(g), b, p, rw)
        }
      }
    val wantedDf = broadcast(
      wanted.toDF("__gk", "__dp_b", "__p", "__rw"))
    // pass 3: only the target buckets sort — a per-(group, bucket)
    // window over ~n/B rows each
    val cand = prepared
      .join(wantedDf.select(col("__gk"), col("__dp_b")).distinct(),
        Seq("__gk", "__dp_b"))
      .withColumn("__dp_rn",
        row_number().over(Window.partitionBy(col("__gk"), col("__dp_b"))
          .orderBy(col("__dp_v"))))
    val pickCols = percents.map { p =>
      max(when(col("__p") === p, col("__dp_v"))).as(s"p$p")
    }
    cand
      .join(wantedDf, Seq("__gk", "__dp_b"))
      .where(col("__dp_rn") === col("__rw"))
      .groupBy(gcols: _*)
      .agg(max(col("__n")).as("n"), pickCols: _*)
  }

}
