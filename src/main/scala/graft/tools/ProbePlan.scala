package graft.tools

import graft.core.Sessions

/** Dev probe: print the formatted physical plan of a registered query. */
object ProbePlan {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.build("probe-plan")
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    graft.SparkEntry.queries(args(0))(spark, dir).explain("formatted")
    spark.stop()
  }
}
