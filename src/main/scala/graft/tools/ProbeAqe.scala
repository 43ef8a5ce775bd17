package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: how much of the sf0.1 per-query time is AQE stage-by-stage
  * re-planning overhead vs real work — times a representative query set
  * with adaptive execution ON vs OFF in the same JVM. */
object ProbeAqe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.Sessions.build("probe-aqe")
    val names = Set("q30_minhash_lsh", "q52_corpus_prep", "q40_ads_travel_time_pipeline",
      "q41_ads_transfer_count_pipeline", "q45_ads_travel_distance_pipeline",
      "q01_agg_pricing_summary", "q20_two_level_agg", "q39_ads_travel_info_pipeline")
    val picked = graft.SparkEntry.registry.filter(q => names(q.name))
    for (aqe <- Seq("true", "false", "true", "false")) {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      // floor with this setting
      def floorRun(): Unit = {
        spark.read.parquet(s"$dir/region.parquet")
          .groupBy("r_regionkey").count().count(); ()
      }
      floorRun()
      val tf0 = System.nanoTime(); floorRun()
      println(f"aqe=$aqe floor ${(System.nanoTime() - tf0) / 1e9}%6.3f s")
      var total = 0.0
      picked.foreach { q =>
        try q.fn(spark, dir).count() catch { case scala.util.control.NonFatal(_) => () }
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        q.fn(spark, dir).count()
        val sec = (System.nanoTime() - t0) / 1e9
        total += sec
        spark.catalog.clearCache(); System.gc()
        println(f"aqe=$aqe ${q.name}%-36s $sec%6.3f s")
      }
      println(f"aqe=$aqe TOTAL $total%6.2f s")
    }
    spark.stop()
  }
}
