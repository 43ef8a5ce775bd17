package graft.tools

import graft.core.{Sessions, Tables}
import graft.ops.TimeOps
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev probe: where q40's seconds go. */
object ProbeQ40 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val s = Sessions.build("probe-q40")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $name%-24s ${(System.nanoTime() - t0) / 1e9}%7.2f s"); r
    }
    val ev = Tables.events(s, dir)
    t("warmup")(ev.count())
    for (rnd <- 1 to 2) {
      s.catalog.clearCache()
      // the SAME cleaned-leg prefix the pipeline uses (an inlined copy
      // would silently time a stale plan shape after the next change)
      val wOrd = Window.partitionBy(col("user_id"), col("day"))
        .orderBy(col("ts"), col("event_id"))
      val legsPlain = graft.pipelines.EventDims
        .cleanedEvents(s, dir, keepUnknown = true)
        .withColumn("travel_us", round(col("value") * 60000000L).cast("long"))
        .withColumn("time_range_type", TimeOps.timeRangeBin(col("value")))
      t(s"r$rnd no-window count")(legsPlain.count())
      val legsW = legsPlain
        .withColumn("leg_id", row_number().over(wOrd))
      t(s"r$rnd windows count")(legsW.count())
      // mirror TravelTime's narrow-before-cache projection, or the
      // probe times a wide cache q40 no longer builds
      val legsNarrow = legsW.select(col("day"), col("region_id"),
        col("user_id"), col("time_range_type"), col("travel_us"),
        col("leg_id"))
      val legs = t(s"r$rnd eager build") { graft.core.Caching.eager(legsNarrow) }
      val tripsTransfers = legs
        .groupBy(col("day").as("ope_date"), col("time_range_type"), col("region_id"))
        .agg(count(lit(1)).as("passenger_trips_num"),
          nullif(sum(when(col("leg_id") > 1, 1L).otherwise(0L)), lit(0L))
            .as("transfer_num"))
      t(s"r$rnd tripsTransfers")(tripsTransfers.count())
      val journeys = legs
        .groupBy(col("day").as("ope_date"), col("user_id"), col("region_id"))
        .agg(sum(col("travel_us")).as("journey_us"))
        .withColumn("time_range_type", TimeOps.timeRangeBinUs(col("journey_us")))
        .groupBy(col("ope_date"), col("time_range_type"), col("region_id"))
        .agg(count(lit(1)).as("journey_num"))
      t(s"r$rnd journeys")(journeys.count())
      val joined = tripsTransfers.join(journeys,
        Seq("ope_date", "time_range_type", "region_id"), "full_outer")
      t(s"r$rnd joined")(joined.count())
      t(s"r$rnd full q40") {
        s.catalog.clearCache()
        graft.SparkEntry.queries("q40_ads_travel_time_pipeline")(s, dir).count()
      }
    }
    s.stop()
  }
}
