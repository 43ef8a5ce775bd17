package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Sessions, Tables}

/** Fact-only scale-up generator for the q55-class sf100 measurement
  * (SCALE.md round-9): replicates orders + lineitem from an existing
  * scaled directory (normally testdata-sf10) xN into disjoint
  * orderkey ranges and copies the dims those queries read. Unlike
  * [[GenScale]] it does NOT shift dates: the revenue-family grain is
  * (month, region, service), so same-date replicas deepen existing
  * groups instead of multiplying them — the realistic way a transit
  * network's data grows 10x (more traffic per month, not more months)
  * and the shape that stresses the aggregation rather than the group
  * count. The orderkey join stays replica-disjoint via the id offset,
  * so join work scales exactly 10x.
  *
  * Usage: runMain graft.tools.GenScaleFacts <inDir> <outDir> <replicas>
  */
object GenScaleFacts {
  def main(args: Array[String]): Unit = {
    val inDir  = if (args.length > 0) args(0) else "testdata-sf10"
    val outDir = if (args.length > 1) args(1) else "testdata-sf100"
    val n      = if (args.length > 2) args(2).toInt else 10
    val spark: SparkSession = Sessions.build("graft-genscale-facts")

    def write(df: DataFrame, name: String): Unit =
      df.write.mode("overwrite").parquet(s"$outDir/$name.parquet")

    Seq("region", "nation").foreach { t =>
      write(Tables.load(spark, inDir, t), t)
    }

    // beyond any key the sf10 input holds (its GenScale offsets stay
    // under 100 * 10^7)
    val KeyOff = 10000000000L

    def replicate(base: DataFrame)(tf: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until n).map(k => tf(base, k)).reduce(_ unionAll _)

    write(replicate(Tables.orders(spark, inDir)) { (df, k) =>
      df.withColumn("o_orderkey", col("o_orderkey") + lit(k * KeyOff))
    }, "orders")

    write(replicate(Tables.lineitem(spark, inDir)) { (df, k) =>
      df.withColumn("l_orderkey", col("l_orderkey") + lit(k * KeyOff))
    }, "lineitem")

    println(s"""{"gen":"$outDir","replicas":$n,"tables":"orders,lineitem,region,nation"}""")
    spark.stop()
  }
}
