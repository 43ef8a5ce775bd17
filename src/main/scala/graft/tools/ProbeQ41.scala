package graft.tools

import graft.core.{Sessions, Tables}
import graft.ops.Rollups
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev probe: stage timings of the q41 transfer-count path. */
object ProbeQ41 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val s = Sessions.build("probe-q41")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $name%-26s ${(System.nanoTime() - t0) / 1e9}%7.2f s"); r
    }
    val ev = Tables.events(s, dir)
    t("warmup")(ev.count())
    for (round <- 1 to 3) {
      s.catalog.clearCache()
      // the SAME cleaned-leg prefix the pipeline uses (an inlined copy
      // would silently time a stale plan shape after the next change)
      val wOrd = Window.partitionBy(col("user_id"), col("day"))
        .orderBy(col("ts"), col("event_id"))
      val legs = graft.pipelines.EventDims.cleanedEvents(s, dir)
        .withColumn("leg_id", row_number().over(wOrd))
      val hist = t(s"r$round hist eager") {
        Rollups.withOverall(legs.withColumnRenamed("day", "t_date"),
          keepCols = Seq(col("t_date"), col("leg_id")), overallCol = "region_id",
          overallLabel = "overall",
          aggs = Seq(count(lit(1)).as("cnt")))
          .transform(graft.core.Caching.eager)
      }
      val spine = hist.groupBy(col("t_date"), col("region_id"))
        .agg(greatest(lit(6), max(col("leg_id"))).as("max_leg"))
        .select(col("t_date"), col("region_id"),
          explode(sequence(lit(0), col("max_leg") - 2)).as("transfer_cnt_type"))
      t(s"r$round spine count")(println("spine rows " + spine.count()))
      val joined = spine
        .join(hist.as("h1"),
          spine("t_date") === col("h1.t_date") &&
          spine("region_id") === col("h1.region_id") &&
          col("h1.leg_id") === col("transfer_cnt_type") + 1, "left")
        .join(hist.as("h2"),
          spine("t_date") === col("h2.t_date") &&
          spine("region_id") === col("h2.region_id") &&
          col("h2.leg_id") === col("transfer_cnt_type") + 2, "left")
        .select(spine("t_date"), spine("region_id"), col("transfer_cnt_type"),
          (coalesce(col("h1.cnt"), lit(0L)) - coalesce(col("h2.cnt"), lit(0L)))
            .as("journey_num"))
        .where(col("journey_num") >= 0)
      t(s"r$round joins count")(println("joined rows " + joined.count()))
      t(s"r$round full q41") {
        s.catalog.clearCache()
        graft.SparkEntry.queries("q41_ads_transfer_count_pipeline")(s, dir).count()
      }
    }
    s.stop()
  }
}
