package graft.tools

import graft.core.{Sessions, Tables}
import graft.ops.{Cleaning, TimeOps}
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
      val line = ev.select(col("event_type").as("line_abbr")).distinct()
        .withColumn("line_clean", Cleaning.deepClean(col("line_abbr")))
        .groupBy(col("line_clean")).agg(min(col("line_abbr")).as("line_abbr"))
        .withColumn("op_dep_no", length(col("line_abbr")) % 6)
      val opDept = Tables.region(s, dir)
        .select(col("r_regionkey").as("op_dep_no"), col("r_name").as("region_name"))
      val w = Window.partitionBy(col("user_id"), col("day"))
      val wOrd = w.orderBy(col("ts"), col("event_id"))
      val legsPlain = ev
        .withColumn("route_clean", Cleaning.deepClean(col("event_type")))
        .join(broadcast(line), col("route_clean") === col("line_clean"), "left")
        .join(broadcast(opDept), Seq("op_dep_no"), "left")
        .withColumn("region_id", coalesce(col("region_name"), lit("Unknown")))
        .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
        .withColumn("travel_us", round(col("value") * 60000000L).cast("long"))
        .withColumn("time_range_type", TimeOps.timeRangeBin(col("value")))
      t(s"r$rnd no-window count")(legsPlain.count())
      val legsW = legsPlain
        .withColumn("leg_id", row_number().over(wOrd))
        .withColumn("n_legs", count(lit(1)).over(w))
      t(s"r$rnd windows count")(legsW.count())
      // mirror TravelTime's narrow-before-cache projection, or the
      // probe times a wide cache q40 no longer builds
      val legsNarrow = legsW.select(col("day"), col("region_id"),
        col("user_id"), col("time_range_type"), col("travel_us"),
        col("leg_id"), col("n_legs"))
      t(s"r$rnd eager build") { graft.core.Caching.eager(legsNarrow); () }
      t(s"r$rnd full q40") {
        s.catalog.clearCache()
        graft.SparkEntry.queries("q40_ads_travel_time_pipeline")(s, dir).count()
      }
    }
    s.stop()
  }
}
