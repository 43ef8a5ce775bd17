package graft

import graft.core.Sessions
import org.apache.spark.sql.SparkSession

/** One shared local session for the whole test JVM (suites run
  * sequentially in the forked test JVM; building SparkSession per suite
  * would dominate test time). */
object SparkTestBase {
  lazy val spark: SparkSession = Sessions.build("graft-test")
  val sf: String = "/root/testdata/sf0.001"
}
