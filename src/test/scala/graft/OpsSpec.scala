package graft

import graft.core.Tables
import graft.functions.DmsToDecimalDegrees
import graft.ops.{Cleaning, Journeys, Rollups, Skew, TimeOps}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class OpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("deepClean strips non-alphanumerics and uppercases") {
    val got = Seq("  a-1 b ", "X_y.z", "\"Q7\"").toDF("s")
      .select(Cleaning.deepClean($"s")).as[String].collect()
    assert(got.toSeq == Seq("A1B", "XYZ", "Q7"))
  }

  test("deepClean byte-scan == the regex form on adversarial inputs") {
    // the oracle SQL keeps upper(regexp_replace(trim(s), '[^A-Za-z0-9]',
    // '')); the codegen byte scan must match it byte-for-byte, incl.
    // multi-byte UTF-8 (every byte of such a code point is dropped),
    // empties, and NULL propagation
    val inputs = Seq("  a-1 b ", "X_y.z", "\"Q7\"", "", "   ", "µßéÄ漢字",
      "a💥b", "MiXeD-123_ok", "\t\nx\r", "ＡＢＣ", "Ωmega9", null)
    val df = inputs.toDF("s")
    val got = df.select(Cleaning.deepClean($"s")).as[Option[String]].collect()
    val want = df.select(upper(regexp_replace(trim($"s"), "[^A-Za-z0-9]", "")))
      .as[Option[String]].collect()
    assert(got.toSeq == want.toSeq)
  }

  test("stripQuotes removes double quotes and trims (F6)") {
    val got = Seq("\" A1 \"", "  plain  ", "\"\"").toDF("s")
      .select(Cleaning.stripQuotes($"s")).as[String].collect()
    assert(got.toSeq == Seq("A1", "plain", ""))
  }

  test("regionFromPrefix dispatch matches reference semantics") {
    val got = Seq("AD1", "ER9", "WR2", "XX").toDF("s")
      .select(Cleaning.regionFromPrefix($"s")).as[String].collect()
    assert(got.toSeq == Seq("Abu Dhabi", "Al Ain", "Al Dhafra", "Unknown"))
  }

  test("regionFromOpDepNo uses first digit of abs value") {
    val got = Seq(11, -23, 305, 907).toDF("n")
      .select(Cleaning.regionFromOpDepNo($"n")).as[String].collect()
    assert(got.toSeq == Seq("Abu Dhabi", "Al Ain", "Al Dhafra", "Unknown"))
  }

  test("distance bins are include-lowest right-closed, null -> NA") {
    val got = Seq[Option[Double]](Some(0.0), Some(5.0), Some(5.1),
        Some(20.0), Some(20.5), None).toDF("km")
      .select(TimeOps.distanceBin($"km")).as[String].collect()
    assert(got.toSeq ==
      Seq("0-5km", "0-5km", "5-10km", "15-20km", ">20km", "NA"))
  }

  test("time bins match the reference's nine ranges + NA fallback") {
    // ads_passenger_travel_time_di.R:140-151: 0-10/10-20/20-30/30-40/
    // 40-50/50-60/60-90/90-120/>120, right-closed, NA fallback.
    val got = Seq[Option[Double]](None, Some(10.0), Some(10.5), Some(35.0),
        Some(45.0), Some(55.0), Some(75.0), Some(100.0), Some(121.0))
      .toDF("m").select(TimeOps.timeRangeBin($"m")).as[String].collect()
    assert(got.toSeq == Seq("NA", "0-10min", "10-20min", "30-40min",
      "40-50min", "50-60min", "60-90min", "90-120min", ">120min"))
  }

  test("clampOrElse zeroes out-of-range, keeps in-range") {
    val got = Seq(-1.0, 0.0, 120.0, 240.0, 241.0).toDF("v")
      .select(TimeOps.clampOrElse($"v", 0, 240, 0.0)).as[Double].collect()
    assert(got.toSeq == Seq(0.0, 0.0, 120.0, 240.0, 0.0))
  }

  test("DmsToDecimalDegrees converts per the reference formula") {
    // 54°12'34.567" = 54 + 12/60 + 34.567/3600 = 54.209602 (6dp)
    val got = Seq(541234567L, -541234567L, 0L, Long.MinValue).toDF("dms")
      .select(DmsToDecimalDegrees.dmsToDecimalDegrees($"dms")).as[Double].collect()
    assert(got(0) == 54.209602)
    assert(got(1) == -54.209602)
    assert(got(2) == 0.0)
    // the one Long that abs() can't negate: NaN, not garbage degrees
    assert(got(3).isNaN)
  }

  test("DmsToDecimalDegrees interpreted eval equals codegen result") {
    assert(DmsToDecimalDegrees.convert(541234567L) == 54.209602)
  }

  test("survivalDiff: exactly-k = count(k) - count(k+1), clamped") {
    val hist = Seq(("d1", 1, 10L), ("d1", 2, 4L), ("d1", 3, 1L), ("d2", 1, 2L))
      .toDF("day", "leg", "cnt")
    val got = Rollups.survivalDiff(hist, Seq($"day"), $"leg", $"cnt", "exact")
      .orderBy($"day", $"leg")
      .select($"day", $"leg", $"exact").as[(String, Int, Long)].collect()
    assert(got.toSeq == Seq(("d1", 1, 6L), ("d1", 2, 3L), ("d1", 3, 1L), ("d2", 1, 2L)))
  }

  test("withOverall grouping-sets equals explicit union of two grains") {
    val df = Seq(("F", "a", 1.0), ("F", "b", 2.0), ("O", "a", 3.0))
      .toDF("st", "pri", "x")
    val got = Rollups.withOverall(df, Seq($"st"), "pri", "overall",
        Seq(sum($"x").as("sx")))
      .select($"st", $"pri", $"sx")
      .orderBy($"st", $"pri").as[(String, String, Double)].collect()
    val expected = Seq(("F", "a", 1.0), ("F", "b", 2.0), ("F", "overall", 3.0),
      ("O", "a", 3.0), ("O", "overall", 3.0))
    assert(got.toSeq == expected)
  }

  test("sessionize opens a new session after the gap threshold") {
    val ts = Seq(0L, 10L, 100L, 105L).map(m => m * 60L * 1000000L) // minutes→us
    val df = ts.zipWithIndex.map { case (us, i) => (1L, i.toLong, us) }
      .toDF("uid", "eid", "us")
      .withColumn("ts", timestamp_micros($"us"))
    val got = Journeys.sessionize(df, Seq($"uid"), $"ts", 30.0, "sess")
      .orderBy($"eid").select($"sess").as[Long].collect()
    assert(got.toSeq == Seq(1L, 1L, 2L, 2L))
  }

  test("transferMicros clamps negatives, >240min, and last-leg nulls to 0") {
    val df = Seq(
      (0L, Some(60L * 1000000L)),          // 1 min → 60e6 us
      (0L, Some(-5L * 1000000L)),          // negative → 0
      (0L, Some(300L * 60L * 1000000L)),   // 300 min → 0
      (0L, None)                           // last leg → 0
    ).toDF("a_us", "b_us")
      .select(timestamp_micros($"a_us").as("a"),
              timestamp_micros($"b_us").as("b"))
    val got = df.select(Journeys.transferMicros($"a", $"b")).as[Long].collect()
    assert(got.toSeq == Seq(60000000L, 0L, 0L, 0L))
  }

  test("mergeable HLL sketches: day sketches union to month estimates") {
    val ev = Tables.events(spark, SparkTestBase.sf)
      .withColumn("day", date_format($"ts", "yyyy-MM-dd"))
      .withColumn("month", date_format($"ts", "yyyy-MM"))
    val daily = Rollups.sketchDistinct(ev,
      Seq($"month", $"day"), $"user_id", "user_sketch")
    val monthly = Rollups.mergeSketches(daily, Seq($"month"),
      "user_sketch", "n_users_est")
      .as[(String, Long)].collect().toMap
    val exact = ev.groupBy($"month")
      .agg(countDistinct($"user_id").as("n"))
      .as[(String, Long)].collect().toMap
    assert(monthly.keySet == exact.keySet)
    monthly.foreach { case (m, est) =>
      val err = math.abs(est.toDouble - exact(m)) / exact(m)
      assert(err < 0.05, s"month $m: estimate $est vs exact ${exact(m)} (err $err)")
    }
    // the merged estimate equals a direct single-pass sketch at month
    // grain — the mergeability contract itself
    val direct = Rollups.mergeSketches(
      Rollups.sketchDistinct(ev, Seq($"month"), $"user_id", "s"),
      Seq($"month"), "s", "n").as[(String, Long)].collect().toMap
    assert(monthly == direct)
  }

  test("Skew.distinctCountSalted equals countDistinct (incl. null handling)") {
    val ev = Tables.events(spark, SparkTestBase.sf)
      // ~1/7 of values null, plus one event_type whose values are ALL
      // null — the group must still appear with count 0
      .withColumn("maybe_user",
        when($"event_id" % 7 === 0 || $"event_type" === "error", lit(null))
          .otherwise($"user_id"))
    val want = ev.groupBy($"event_type")
      .agg(countDistinct($"maybe_user").as("n_users"))
      .as[(String, Long)].collect().toSet
    val got = Skew.distinctCountSalted(ev, Seq("event_type"), "maybe_user", "n_users")
      .as[(String, Long)].collect().toSet
    assert(got == want)
  }

  test("Skew.saltedInnerJoin equals the plain inner join") {
    val ev = Tables.events(spark, SparkTestBase.sf)
      .select($"event_id", $"event_type", $"value")
    val dim = Tables.events(spark, SparkTestBase.sf)
      .select($"event_type").distinct()
      .withColumn("type_len", length($"event_type"))
    val want = ev.join(dim, Seq("event_type"))
      .select($"event_id", $"type_len").as[(Long, Int)].collect().sorted.toSeq
    val got = Skew.saltedInnerJoin(ev, dim, Seq("event_type"),
        saltFrom = $"event_id", buckets = 8)
      .select($"event_id", $"type_len").as[(Long, Int)].collect().sorted.toSeq
    assert(got == want)
  }

  test("Sampling: stable under repartition, nested fractions, full coverage") {
    import graft.ops.Sampling
    val docs = Tables.documents(spark, SparkTestBase.sf).select($"doc_id")
    val s10 = Sampling.sample(docs, "doc_id", 0.1).as[Long].collect().toSet
    val s20 = Sampling.sample(docs, "doc_id", 0.2).as[Long].collect().toSet
    assert(s10.subsetOf(s20), "smaller fraction must nest inside larger")
    // stability: the same ids survive regardless of physical layout
    val s10b = Sampling.sample(docs.repartition(7), "doc_id", 0.1)
      .as[Long].collect().toSet
    assert(s10b == s10)
    assert(s10.nonEmpty && s20.size > s10.size)
    // splits summing to 1 label every row, and are disjoint by construction
    val labeled = docs.withColumn("split", Sampling.splitColumn($"doc_id",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)))
    assert(labeled.where($"split".isNull).isEmpty)
    val byLabel = labeled.groupBy($"split").count()
      .as[(String, Long)].collect().toMap
    val total = byLabel.values.sum
    assert(byLabel("train") > byLabel("val") && byLabel("train") > byLabel("test"))
    assert(total == docs.count())
    // snowflake-scale 64-bit ids must hash without Long overflow (ANSI
    // would throw): the two-limb fold keeps every product in range
    val big = Seq(1400000000000000000L, Long.MaxValue, 3470000000L).toDF("id")
    val buckets = big.select(Sampling.bucket($"id")).as[Long].collect()
    assert(buckets.forall(b => b >= 0 && b < 1000000L), buckets.toSeq)
    // a non-negative id reproduces the documented ANSI twin arithmetic
    val twin = big.selectExpr(
      "((id % 2147483647) * 2654435761 + ((id div 2147483647) % 2147483647) * 40503) " +
      "% 4294967296 % 1000000").as[Long].collect()
    assert(buckets.toSeq == twin.toSeq, "bucket must equal the ANSI twin")
    // negative ids would silently land in a different split than the
    // ANSI twin assigns (negative-% semantics) — rejected loudly
    val neg = intercept[Exception] {
      Seq(-1L).toDF("id").select(Sampling.bucket($"id")).collect()
    }
    assert(neg.getMessage.contains("ids >= 0"), neg.getMessage)
  }

  test("bucketed exact percentiles equal the full-sort form") {
    import graft.ops.Distributions
    val li = Tables.lineitem(spark, SparkTestBase.sf).select(
      $"l_returnflag", $"l_linestatus",
      round($"l_extendedprice" * 100).cast("long").as("cents"))
    val groups = Seq("l_returnflag", "l_linestatus")
    val full = Distributions.discPercentiles(li, groups, $"cents",
        Seq(50, 90, 99))
      .orderBy($"l_returnflag", $"l_linestatus").collect().toSeq
    val bucketed = Distributions.discPercentilesBucketed(li, groups, $"cents",
        Seq(50, 90, 99))
      .orderBy($"l_returnflag", $"l_linestatus").collect().toSeq
    assert(full.nonEmpty && bucketed == full)
    // the r17 size-dispatched CACHED form (group-scaled frames cached
    // when the fact's estimated bytes clear the floor — forced here
    // with floor 0) picks identically to the inline form
    val bucketedCached = Distributions.discPercentilesBucketed(
        li, groups, $"cents", Seq(50, 90, 99), cacheFactBytes = 0L)
      .orderBy($"l_returnflag", $"l_linestatus").collect().toSeq
    assert(bucketedCached == full)
    spark.catalog.clearCache()
    // group columns of ANY type (here timestamp) work — every join
    // builds its composite key Spark-side, so there is no
    // driver/executor stringification parity to break (pre-round-8
    // this failed loudly; now it is simply supported)
    val tsGrouped = Distributions.discPercentilesBucketed(
      li.withColumn("ts",
        to_timestamp(lit("2024-01-01 00:00:00"))),
      Seq("ts"), $"cents", Seq(50)).collect().toSeq
    assert(tsGrouped.size == 1 &&
      tsGrouped.head.getLong(2) ==
        Distributions.discPercentiles(li, Nil, $"cents", Seq(50))
          .collect().head.getLong(1))
    // a NON-NUMERIC measure fails loudly (no monotone long key exists
    // to bucket on) instead of silently mis-bucketing
    val mEx = intercept[IllegalArgumentException] {
      Distributions.discPercentilesBucketed(
        li.withColumn("s", $"l_returnflag"), groups, $"s", Seq(50))
    }
    assert(mEx.getMessage.contains("discPercentiles"))
    // fractional measures bucket on a derived long key but rank and
    // return the ORIGINAL double — no silent truncation (values below
    // 1.0 all share derived key 0 yet still rank exactly)
    val fracs = Seq(("a", 0.13), ("a", 0.11), ("a", 0.92), ("a", 0.57),
      ("b", 1.5), ("b", -2.25), ("b", 0.75)).toDF("g", "v")
    val fFr = Distributions.discPercentiles(fracs, Seq("g"), $"v",
        Seq(25, 50, 100)).orderBy($"g").collect().toSeq
    val bFr = Distributions.discPercentilesBucketed(fracs, Seq("g"), $"v",
        Seq(25, 50, 100), buckets = 4).orderBy($"g").collect().toSeq
    assert(bFr == fFr && fFr.head.getDouble(2) == 0.11)
    // NULL group values group together (matching the window form's
    // partitionBy semantics) instead of being rejected
    val nullG = Seq((Some("x"), 1L), (None, 5L), (None, 7L), (Some("x"), 3L))
      .toDF("g", "v")
    val fNg = Distributions.discPercentiles(nullG, Seq("g"), $"v",
      Seq(50, 100)).orderBy($"g").collect().toSeq
    val bNg = Distributions.discPercentilesBucketed(nullG, Seq("g"), $"v",
      Seq(50, 100), buckets = 2).orderBy($"g").collect().toSeq
    assert(bNg == fNg && bNg.exists(_.isNullAt(0)))
    // null measures are excluded on BOTH forms (standard SQL
    // percentile semantics), not an NPE on the bucketed driver pass
    val withNulls = Seq(("g", Some(1L)), ("g", None), ("g", Some(3L)),
      ("g", Some(2L))).toDF("g", "v")
    val fN = Distributions.discPercentiles(withNulls, Seq("g"), $"v",
      Seq(50, 100)).collect().toSeq
    val bN = Distributions.discPercentilesBucketed(withNulls, Seq("g"), $"v",
      Seq(50, 100), buckets = 2).collect().toSeq
    assert(fN == bN && fN.head.getLong(1) == 3L, s"$fN vs $bN") // n=3, nulls out
    // tie-heavy + tiny-bucket stress: values collapse onto few points,
    // so target ranks land inside tie runs and bucket edges
    val ties = Seq.tabulate(200)(i => ("g" + (i % 2), (i % 5).toLong))
      .toDF("g", "v")
    val f2 = Distributions.discPercentiles(ties, Seq("g"), $"v",
        Seq(1, 50, 100)).orderBy($"g").collect().toSeq
    val b2 = Distributions.discPercentilesBucketed(ties, Seq("g"), $"v",
        Seq(1, 50, 100), buckets = 2).orderBy($"g").collect().toSeq
    assert(b2 == f2)
  }

  test("mixtureSample: achieved mix tracks target weights at max volume") {
    import graft.ops.Sampling
    val docs = Tables.documents(spark, SparkTestBase.sf)
      .select($"doc_id", $"source")
    val weights = Map("src0" -> 500000L, "src1" -> 300000L, "src2" -> 200000L)
    val kept = Sampling.mixtureSample(docs, "doc_id", "source", weights)
    val bySrc = kept.groupBy($"source").count()
      .as[(String, Long)].collect().toMap
    // unweighted sources are dropped entirely
    assert(bySrc.keySet.subsetOf(weights.keySet), bySrc.keySet)
    // sources are uniform in the fixture, so the scarcest-per-weight
    // source is the heaviest weight: src0 keeps (nearly) everything
    val c0 = docs.where($"source" === "src0").count()
    assert(bySrc("src0") >= c0 - 1, s"src0 kept ${bySrc("src0")} of $c0")
    // achieved shares track the targets to hash-bucket uniformity
    val total = bySrc.values.sum.toDouble
    Seq("src0" -> 0.5, "src1" -> 0.3, "src2" -> 0.2).foreach { case (s, w) =>
      val share = bySrc(s) / total
      assert(math.abs(share - w) < 0.1, s"$s share $share vs target $w")
    }
    // stability: same kept set under a different physical layout
    val keptIds = kept.select($"doc_id").as[Long].collect().toSet
    val keptIds2 = Sampling.mixtureSample(docs.repartition(7), "doc_id",
        "source", weights).select($"doc_id").as[Long].collect().toSet
    assert(keptIds == keptIds2)
    // malformed weights fail loudly
    intercept[IllegalArgumentException] {
      Sampling.mixtureSample(docs, "doc_id", "source",
        Map("src0" -> 400000L, "src1" -> 300000L))
    }
    intercept[IllegalArgumentException] {
      Sampling.mixtureSample(docs, "doc_id", "source",
        Map("absent_src" -> 1000000L))
    }
  }

  test("asOfJoin: most recent version at or before, ties, nulls, left mode") {
    import graft.ops.AsOf
    val events = Seq(
      ("r1", 100L, 1L), ("r1", 50L, 2L), ("r1", 10L, 3L),
      ("r1", 5L, 4L),                       // before any version
      ("r2", 100L, 5L)                      // key with one version
    ).toDF("route", "ts", "eid")
    val versions = Seq(
      ("r1", 10L, Some("a")),               // tie with eid=3 — applies
      ("r1", 60L, None),                    // NULL payload FIELD kept
      ("r2", 40L, Some("c"))
    ).toDF("route", "valid_from", "fare")
    val inner = AsOf.asOfJoin(events, versions, Seq("route"), "ts", "valid_from")
      .select($"eid", $"fare").as[(Long, Option[String])].collect().toMap
    assert(inner == Map(
      1L -> None,        // v@60 wins over v@10; its null FIELD survives
      2L -> Some("a"), 3L -> Some("a"), 5L -> Some("c")))
    assert(!inner.contains(4L), "no version at or before ts=5 → dropped (inner)")
    val leftKept = AsOf.asOfJoin(events, versions, Seq("route"), "ts", "valid_from",
        how = "left")
      .select($"eid").as[Long].collect().toSet
    assert(leftKept.contains(4L), "left mode keeps unmatched rows")
    // a version with NULL valid_from (or NULL key) must match NOTHING —
    // join semantics, and what DuckDB's native ASOF does — not become
    // an in-force-since-forever version via NULLS FIRST ordering
    val nullVersions = Seq(
      (Some("r1"), None, Some("x")),
      (None, Some(1L), Some("y"))
    ).toDF("route", "valid_from", "fare")
    val nulls = AsOf.asOfJoin(events, nullVersions, Seq("route"), "ts", "valid_from")
      .collect()
    assert(nulls.isEmpty, s"NULL version rows matched: ${nulls.toSeq}")
    // payload colliding with leftTime must be rejected, not duplicated
    val e2 = intercept[IllegalArgumentException] {
      AsOf.asOfJoin(events, versions.withColumn("ts", lit(1L)),
        Seq("route"), "ts", "valid_from")
    }
    assert(e2.getMessage.contains("rename"))
  }

  test("AQE splits a skewed sort-merge join partition (runtime twin of saltedInnerJoin)") {
    // The toolkit's third leg: Sessions enables adaptive skew-join, and
    // this pins that it actually FIRES — a generated hot key whose
    // shuffle partition dwarfs the others must come out of AQE as a
    // split sort-merge join (`skew=true` on the finalized plan), with
    // the same rows as the logical join. Complements the manual salting
    // paths above, which cover the shapes AQE cannot split.
    val conf = spark.conf
    val keys = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes")
    val saved = keys.map(k => k -> scala.util.Try(conf.get(k)).toOption)
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
      // 40k rows on key 0 with a fat payload vs 1 row each on 1..99:
      // key 0's partition is orders of magnitude past factor × median
      val pad = "x" * 64
      val left = spark.range(0, 40000)
        .select(lit(0L).as("k"), concat(lit(pad), $"id").as("payload"))
        .union(spark.range(1, 100).select($"id".as("k"), lit(pad).as("payload")))
      val right = spark.range(0, 100).select($"id".as("k"), ($"id" * 10).as("v"))
      val joined = left.join(right, Seq("k"))
      // collect() (not count()) so the adaptive plan inspected below is
      // the one that actually ran — count() builds its own QueryExecution
      assert(joined.collect().length === 40000 + 99)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"expected a skew-split SMJ in the finalized adaptive plan:\n${finalPlan.take(3000)}")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }

  test("GraftFunctions: SQL surface matches the Column API kernels") {
    graft.functions.GraftFunctions.register(spark)
    val row = spark.sql(
      """SELECT
        |  simhash64(array('a','b','c')) AS sh,
        |  rolling_hash64(array('one','two')) AS rh,
        |  dms_to_decimal(541234567L) AS dd,
        |  float_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
        |            array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS fd,
        |  long_dot(array(1L, 2L), array(3L, 4L)) AS ld
        |""".stripMargin + "FROM (SELECT 1)").head()
    import graft.functions.{DmsToDecimalDegrees, SimHash64}
    val shWant = spark.range(1)
      .select(SimHash64.simhash64(array(lit("a"), lit("b"), lit("c"))))
      .head().getLong(0)
    assert(row.getLong(0) == shWant)
    assert(row.getLong(1) != 0L)
    assert(math.abs(row.getDouble(2) - DmsToDecimalDegrees.convert(541234567L)) < 1e-12)
    assert(row.getDouble(3) == 11.0)
    assert(row.getLong(4) == 11L)
  }

  test("GraftExtensions installs the SQL functions via spark.sql.extensions") {
    // Builder.create() (Spark 4) builds a genuinely NEW session over the
    // shared SparkContext unconditionally — getOrCreate would return the
    // suite session, whose register() call above makes this vacuous.
    spark.sparkContext // force shared-context init; create() reuses it
    // withExtensions exercises our injector through the public hook; the
    // equivalent spark.sql.extensions=graft.functions.GraftFunctions$GraftExtensions
    // conf-string path is static conf, appliable only at SparkContext build.
    val s2 = org.apache.spark.sql.classic.SparkSession.builder()
      .master("local[2]") // ignored: SparkContext.getOrCreate finds the live one
      .withExtensions(new graft.functions.GraftFunctions.GraftExtensions)
      .create()
    try {
      assert(s2 ne spark, "extensions test must run on a fresh session")
      val n = s2.sql("SELECT long_dot(array(2L, 3L), array(5L, 7L)) AS d")
        .head().getLong(0)
      assert(n == 31L)
    } finally {
      org.apache.spark.sql.classic.SparkSession
        .setActiveSession(spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession])
    }
  }

  test("perSourceCap: exact counts, window-form equality, repartition stability") {
    import graft.ops.Sampling
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, SparkTestBase.sf)
      .select($"doc_id", $"source")

    // reference: the naive sorted-window form the distributed
    // selection must reproduce EXACTLY (same (bin, id) order)
    def windowForm(df: org.apache.spark.sql.DataFrame, cap: Long,
                   bins: Int): Set[Long] = {
      val bin = pmod(Sampling.bucket($"doc_id"), lit(bins.toLong))
      df.withColumn("__rn", row_number().over(
          Window.partitionBy($"source").orderBy(bin, $"doc_id")))
        .where($"__rn" <= cap).select($"doc_id").as[Long].collect().toSet
    }

    for (bins <- Seq(4096, 4); cap <- Seq(10L, 0L, 1000000L)) {
      val want = windowForm(docs, cap, bins)
      val got = Sampling.perSourceCap(docs, "doc_id", "source", cap, bins)
        .select($"doc_id").as[Long].collect().toSet
      assert(got == want, s"perSourceCap != window form at cap=$cap bins=$bins")
      val sel = Sampling.perSourceCapLargeCap(docs, "doc_id", "source",
          cap, bins)
        .select($"doc_id").as[Long].collect().toSet
      assert(sel == want,
        s"perSourceCapLargeCap != window form at cap=$cap bins=$bins")
    }

    // exact per-source kept counts: min(cap, count); bins=4 forces the
    // selection variant's boundary-bin ranking path (each bin holds
    // ~6 docs per source)
    val kept = Sampling.perSourceCapLargeCap(docs, "doc_id", "source",
        10, bins = 4)
      .groupBy($"source").count().as[(String, Long)].collect().toMap
    val totals = docs.groupBy($"source").count()
      .as[(String, Long)].collect().toMap
    assert(totals.forall { case (s, n) => kept(s) == math.min(10L, n) },
      s"kept counts off: $kept vs $totals")

    // partitioning-invariance of the kept SET, both variants
    assert(Sampling.perSourceCap(docs.repartition(7), "doc_id",
        "source", 10, bins = 4)
      .select($"doc_id").as[Long].collect().toSet == windowForm(docs, 10, 4))
    assert(Sampling.perSourceCapLargeCap(docs.repartition(7), "doc_id",
        "source", 10, bins = 4)
      .select($"doc_id").as[Long].collect().toSet == windowForm(docs, 10, 4))

    // the default form's scale contract IS the group-limit rewrite:
    // a small cap must plan as WindowGroupLimit (partial top-cap per
    // input partition before the one exchange)
    val plan = Sampling.perSourceCap(docs, "doc_id", "source", 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"expected WindowGroupLimit in the small-cap plan:\n$plan")
  }

  test("topFractionByRate: selection form == single-partition window, ties and edges included") {
    import graft.ops.Sampling
    import org.apache.spark.sql.expressions.Window

    def windowForm(df: org.apache.spark.sql.DataFrame,
                   num: Long, den: Long): Set[Long] = {
      val n = df.count()
      val k = n * num / den
      df.withColumn("__rn", row_number().over(
          Window.orderBy($"rate".desc, $"id")))
        .where($"__rn" <= k).select($"id").as[Long].collect().toSet
    }
    def keptOf(df: org.apache.spark.sql.DataFrame, num: Long, den: Long,
               bins: Int): Set[Long] = {
      val out = Sampling.topFractionByRate(df, "rate", "id", num, den,
          bins, exactBelow = 0)
        .where($"kept").select($"id").as[Long].collect().toSet
      spark.catalog.clearCache()
      out
    }

    // distinct rates, a heavy tie block straddling the cut, and a
    // constant tail — the boundary-bin tie-break path gets exercised
    // at bins=4 (coarse bins force multi-rate boundary bins) and 4096
    val rnd = new scala.util.Random(20260815L)
    val rows = (1L to 400L).map { i =>
      val rate =
        if (i <= 120) rnd.nextDouble() * 10.0  // distinct-ish
        else if (i <= 280) 5.0                 // tie block
        else -3.25                             // negative constant tail
      (i, rate)
    }
    val df = rows.toDF("id", "rate")
    for (bins <- Seq(4, 4096); num <- Seq(1L, 3L); den <- Seq(4L)) {
      val want = windowForm(df, num, den)
      val got = keptOf(df, num, den, bins)
      assert(got == want,
        s"selection != window at $num/$den bins=$bins: " +
          s"missed=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
    }
    // partitioning invariance
    assert(keptOf(df.repartition(7), 1, 4, 4) == windowForm(df, 1, 4))
    // ALL rates equal: the documented degenerate case must still be
    // exact (k lowest ids)
    val flat = (1L to 100L).map(i => (i, 1.5)).toDF("id", "rate")
    assert(keptOf(flat, 1, 4, 4096) == (1L to 25L).toSet)
    // k = 0 (fraction rounds to zero) and num == den (keep everything)
    assert(keptOf(df.limit(3), 1, 4, 4096) == Set.empty[Long])
    assert(keptOf(df, 4, 4, 4096) == rows.map(_._1).toSet)
  }
}
