package graft.core

import org.apache.spark.sql.SparkSession

/** Session construction for all entry points (Verify, Bench, tests).
  *
  * Scale stance (SURVEY.md §7.4 item 8): these settings are the ones
  * that transfer to a real cluster — AQE on (runtime coalescing + skew
  * join splitting), shuffle partitions sized to the parallelism at hand
  * rather than the 200 default, UTC session time zone for deterministic
  * date semantics, and nanos-as-long so the parquet TIMESTAMP(NANOS)
  * events table is readable (Spark has no nanosecond TimestampType).
  */
object Sessions {

  def cpus: Int = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)
    .getOrElse(math.min(32, Runtime.getRuntime.availableProcessors()))

  def build(appName: String): SparkSession = {
    val n = cpus
    val spark = SparkSession.builder()
      .master(s"local[$n]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", n.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      // explicit (it defaults on with AQE): runtime splitting of skewed
      // shuffle-join partitions is the engine's skew answer for
      // hot-route/hot-user keys (SURVEY.md §7.4 item 8)
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // coalesce post-shuffle partitions by target size, not up to the
      // cluster's parallelism (the Spark docs' recommended production
      // setting): a reduce side holding a few MB collapses to a few
      // tasks instead of fanning out to every core — fewer task
      // launches per stage here, better utilization on a busy cluster
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16MB")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // Testdata parquet stores naive timestamp[us] (isAdjustedToUTC =
      // false), which Spark ≥3.4 infers as TIMESTAMP_NTZ by default.
      // The engine's time arithmetic (unix_micros, window ranges) and
      // the DuckDB oracle comparison both assume instant semantics in
      // the UTC session zone, so read them as TIMESTAMP (LTZ) — same
      // instants, NTZ inference off.
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      // The ContextCleaner frees broadcast/shuffle blocks only after a
      // driver GC collects their references; with a large heap under low
      // allocation pressure that can be never during a 90-execution
      // session, so state from early queries accumulates until late
      // queries spill (measured: queries near the end of the bench
      // degrading 5-30x non-deterministically). Default is 30min —
      // far longer than the whole session.
      .config("spark.cleaner.periodicGC.interval", "30s")
      // default 100 entries — a 50-query session generates far more
      // codegen classes than that, so the LRU evicts a query's
      // just-compiled classes between its warmup and timed runs
      // (worse: AQE re-plans make recompiles non-deterministic —
      // measured as individual heavy queries randomly running at their
      // cold-codegen cost mid-session)
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** Make a driver-supplied session usable for our reads even when it was
    * not built by [[build]] (runtime-settable SQL confs only). A conf the
    * session rejects (non-runtime-settable) is warned about, not
    * swallowed silently — without nanosAsLong the events read fails
    * later with an unrelated-looking vectorized-reader error. Fatal
    * JVM errors propagate (NonFatal, not Throwable).
    */
  def tune(spark: SparkSession): SparkSession = {
    Seq("spark.sql.legacy.parquet.nanosAsLong" -> "true",
        "spark.sql.parquet.inferTimestampNTZ.enabled" -> "false",
        "spark.sql.session.timeZone" -> "UTC").foreach { case (k, v) =>
      try spark.conf.set(k, v)
      catch {
        case scala.util.control.NonFatal(e) =>
          System.err.println(s"[graft] could not set $k=$v on the " +
            s"provided session (${e.getMessage}); reads that need it may fail")
      }
    }
    spark
  }
}
