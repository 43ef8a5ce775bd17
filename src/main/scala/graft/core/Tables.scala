package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loaders for the driver-provided star schema
  * (TESTDATA.md). Every `SparkEntry.queries` entry receives an `sfDir`
  * and resolves tables through here so scans stay uniform: plain
  * `spark.read.parquet` — column pruning and predicate pushdown are left
  * to Catalyst (SURVEY.md §2.1 S1-S3: the reference hand-codes
  * projection/pushdown at scan time, Spark derives them from the plan).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** `events.ts` is written as parquet TIMESTAMP(NANOS) which Spark's
    * vectorized reader cannot represent as TimestampType; reading via
    * `spark.sql.legacy.parquet.nanosAsLong=true` (set in [[Sessions]])
    * yields a LongType of nanos-since-epoch. We normalize to a proper
    * TimestampType column (microsecond precision) here so downstream
    * operators see an event-time column, matching DuckDB's
    * `ts` truncated to micros.
    */
  /** Smallest value of an id column — the TRANSLATION-INVARIANT anchor
    * for fixture-window predicates. Queries that bound a demo subset
    * by absolute id (`l_orderkey < 400`, `vec_id < 50`) silently go
    * EMPTY on id-translated twins of the fixture (GenOffset's big-id
    * gate, SCALE.md r16), so they anchor at `minId(...) + K` instead:
    * identical results wherever ids start at 0 (every driver fixture
    * and GenScale replica set), the same translated window at any
    * offset. One column-min aggregation job per call — driver-side
    * scalar by contract (the CC limit-probe rule); callers embed the
    * result as a literal so the predicate still pushes down to the
    * scan. Empty input returns Long.MinValue (the window predicate
    * then selects nothing, matching an empty scan). */
  def minId(df: DataFrame, column: String): Long = {
    import org.apache.spark.sql.functions.min
    val row = df.agg(min(column)).head()
    if (row.isNullAt(0)) Long.MinValue else row.getLong(0)
  }

  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // integer `div`, NOT `/`: double division of ~1.7e18 nanos loses
        // precision (ulp 256 ns) and shifts ~1 in 8 rows by a microsecond
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => raw
    }
  }
}
