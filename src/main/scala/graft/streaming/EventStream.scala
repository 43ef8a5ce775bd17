package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming restatement of the reference's incremental
  * patterns (SURVEY.md §2.9): the reference is pure batch with manual
  * chunk loops + mergeable accumulators (ST1) and resume markers (ST3);
  * here the same aggregations run incrementally with event-time
  * watermarks — the shape that absorbs a continuous AFC/event feed at
  * scale without re-reading history.
  */
object EventStream {

  /** Parquet schema of the events table as written (ts = nanos int64,
    * read under nanosAsLong — see graft.core.Tables.events). */
  val rawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", LongType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** File-source stream over a directory of event parquet files,
    * normalized to a proper event-time column. */
  def readEvents(spark: SparkSession, dir: String,
                 glob: String = "events.parquet"): DataFrame =
    spark.readStream
      .schema(rawSchema)
      .option("pathGlobFilter", glob)
      .parquet(dir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))

  /** Tumbling event-time window aggregation with a late-data watermark:
    * the streaming twin of the per-day batch aggregates (EP2). State is
    * bounded by the watermark horizon — required at 100 TB/day feeds. */
  def tumblingCounts(events: DataFrame, window_ : String = "1 hour",
                     watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      // exact cents sum: streaming partial-state addition order is even
      // less deterministic than batch — integer cents make the running
      // total exact and the q37 stream==batch contract bit-identical
      .agg(count(lit(1)).as("n_events"),
           graft.ops.Cleaning.sumExact2(col("value")).as("total_value"))
      .select(
        col("window.start").as("window_start"),
        col("event_type"), col("n_events"), col("total_value"))

  /** Gap-based sessionization via the built-in `session_window` — the
    * streaming form of [[graft.ops.Journeys.sessionize]] (q05), with
    * watermark-bounded state: a session closes once the watermark
    * passes its end, so state never grows with total users, only with
    * concurrently-open sessions. Boundary semantics vs the batch
    * running-sum form: `session_window` opens a NEW session at a gap of
    * exactly `gap`; `sessionize` keeps it (strict `>`). Identical for
    * every non-boundary gap (StreamingSpec asserts equality on data
    * verified free of exact-boundary gaps). Note `session_window.end`
    * is last-event + gap; the emitted `duration_us` is therefore
    * computed as max(ts) − min(ts) — the q05 span — NOT from the
    * window bounds. */
  def sessionAggregates(events: DataFrame, gap: String = "30 minutes",
                        watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        (max(unix_micros(col("ts"))) - min(unix_micros(col("ts"))))
          .as("duration_us"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("n_events"), col("duration_us"))

  final case class UserRunning(user_id: Long, n_events: Long, total_value: Double)

  /** ST4-style custom state: running per-user totals via
    * `flatMapGroupsWithState` — the streaming form of the reference's
    * first-seen/accumulator upserts
    * (`scripts/ads_passenger_travel_distance_di.py:26-52`).
    *
    * State is BOUNDED by an event-time timeout keyed to the watermark:
    * a user idle past `idleTimeout` (measured in event time) has its
    * state evicted on the next trigger after the watermark passes. A
    * `NoTimeout` variant would grow one state entry per user forever —
    * an OOM guarantee on a continuous 100 TB feed. StreamingSpec
    * asserts the eviction (a returning user restarts from zero). */
  def runningUserTotals(events: DataFrame, watermark: String = "2 hours",
                        idleTimeout: String = "24 hours"): Dataset[UserRunning] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", watermark)
      .select(col("user_id"), col("value"), col("ts"))
      .as[(Long, Double, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(
        OutputMode.Update(), GroupStateTimeout.EventTimeTimeout()) {
        (uid: Long, rows: Iterator[(Long, Double, java.sql.Timestamp)],
         st: GroupState[UserRunning]) =>
          if (st.hasTimedOut) {
            st.remove()
            Iterator.empty
          } else {
            val prev = st.getOption.getOrElse(UserRunning(uid, 0L, 0.0))
            var n = prev.n_events; var tot = prev.total_value
            var maxTs = Long.MinValue
            rows.foreach { r =>
              n += 1; tot += r._2; maxTs = math.max(maxTs, r._3.getTime)
            }
            val next = UserRunning(uid, n, tot)
            st.update(next)
            st.setTimeoutTimestamp(maxTs, idleTimeout)
            Iterator.single(next)
          }
      }
  }

  /** Streaming exact dedup — the continuous-ingest twin of the batch
    * fingerprint dedup ([[graft.llm.Dedup.exactDupGroups]]): documents
    * arriving on a stream are emitted once per canonical fingerprint,
    * using Spark's built-in `dropDuplicatesWithinWatermark` state store
    * (no custom state code needed — the Spark-first form). State is
    * bounded by the watermark horizon: a fingerprint not re-seen within
    * it is evicted, which is the right contract for crawl feeds where
    * duplicates cluster in time (exact global dedup over unbounded
    * history belongs to the batch path / a compaction job).
    *
    * Takes any streaming DataFrame with a text column and an event-time
    * column already present. */
  def streamingExactDedup(docs: DataFrame, textCol: String, tsCol: String,
                          watermark: String = "2 hours"): DataFrame =
    docs
      .withColumn("fp", graft.llm.TextStats.fingerprint(col(textCol)))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("fp")

  /** Stream-stream INTERVAL join: each tap (left) enriched with the
    * same user's follow-up events (right) arriving within `horizon`
    * after it — the continuous form of the reference's
    * inspection-to-trip matching (fare checks joined to the journeys
    * they audited). Both sides carry watermarks and the join condition
    * bounds event time in BOTH directions, so Spark can evict buffered
    * rows once the watermark passes their match window — without the
    * time bound a stream-stream join buffers each side FOREVER, the
    * classic production state leak. State ≈ horizon + watermark worth
    * of rows per side regardless of stream age: the 100 TB/day shape.
    *
    * Inner join in append mode: a result row is emitted once both
    * sides have arrived; rows with no match inside the horizon simply
    * never emit (left-outer needs the watermark to close the window
    * before emitting the null row — same bounds, later output). */
  def intervalJoin(taps: DataFrame, followUps: DataFrame,
                   watermark: String = "2 hours",
                   horizon: String = "30 minutes"): DataFrame = {
    val l = taps
      .select(col("user_id"), col("ts").as("tap_ts"),
        col("event_id").as("tap_id"), col("event_type").as("route"))
      .withWatermark("tap_ts", watermark)
    val r = followUps
      .select(col("user_id").as("fu_user"), col("ts").as("fu_ts"),
        col("event_id").as("fu_id"), col("event_type").as("fu_type"))
      .withWatermark("fu_ts", watermark)
    l.join(r,
        col("user_id") === col("fu_user") &&
        col("fu_ts") > col("tap_ts") &&
        col("fu_ts") <= col("tap_ts") + expr(s"INTERVAL $horizon"))
      .select(col("user_id"), col("tap_id"), col("route"),
        col("tap_ts"), col("fu_id"), col("fu_type"), col("fu_ts"))
  }

  /** Drive a streaming query to completion over the (static) test
    * directory via a memory sink — how StreamingSpec observes results
    * synchronously. Returns the collected sink table. */
  def runToMemorySink(spark: SparkSession, agg: DataFrame,
                      queryName: String, outputMode: OutputMode): DataFrame = {
    val q = agg.writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode(outputMode)
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(queryName)
  }
}
