package graft.tools

import graft.core.{Sessions, Tables}
import org.apache.spark.sql.functions._

/** Dev probe: inspect how Spark reads the nanosecond events table. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.build("probe")
    val raw = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    raw.printSchema()
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    ev.printSchema()
    ev.select(col("event_id"), unix_micros(col("ts")).as("us"))
      .orderBy(col("event_id")).limit(5).show(false)
    spark.stop()
  }
}
