package graft.tools

import graft.core.Sessions

/** Dev probe: run one registered query against one SF dir, print timing
  * and row count, optionally dump parquet for oracle diffing.
  * Usage: runMain graft.tools.Probe <queryName> <sfDir> [outPath]
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = Sessions.build("probe")
    val fn = graft.SparkEntry.queries(name)
    val t0 = System.nanoTime()
    val df = fn(spark, sfDir)
    if (args.length > 2) {
      df.coalesce(1).write.mode("overwrite").parquet(args(2))
      println(f"PROBE $name rows=${spark.read.parquet(args(2)).count()} sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    } else {
      val n = df.count()
      println(f"PROBE $name rows=$n sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    spark.stop()
  }
}
