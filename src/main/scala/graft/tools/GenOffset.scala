package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Sessions, Tables}

/** Big-id-offset twin of a test fixture (round-15 verdict directive
  * #3): copies every table, translating the FACT ids — exactly the
  * columns [[GenScale]] offsets per replica — by a single constant at
  * the replica-offset magnitude (10^9, where GenScale's sf10 ids
  * land), so the FULL oracle gate (Verify + DuckDB hash compare) can
  * run in the big-id regime the sf0.01 fixture can never reach.
  *
  * Why this exists: the q75 overflow (SCALE.md r15) was an id-checksum
  * SUM whose ~4·10^15 terms only exist at replica-offset magnitudes —
  * the 105-oracle hash gate at sf0.01 ids (~10^3) is structurally
  * blind to that class, and the r15 value-level gate could reach only
  * the nine linear-oracle checksum queries (the quadratic oracles —
  * q75's all-pairs truth, q91/q92's recursive CC — don't replay in
  * DuckDB at 500k docs). At sf0.01 row counts they DO replay, so an
  * id-offset sf0.01 twin runs the entire registry, quadratic oracles
  * included, with every id-derived term at overflow-candidate
  * magnitude — overflow is excluded by construction, not by spot
  * checks, and ANSI mode turns any residue into a loud error.
  *
  * The offset is a pure translation: dates, text, embeddings, and dim
  * tables are byte-identical, so every join stays live and both
  * engines compute the SAME translated results (the gate compares
  * Spark vs DuckDB on the offset fixture directly — no relation to
  * the un-offset results is needed). 10^9 is a multiple of 400, so
  * the media fixtures' id/100 family blocks and floorMod(id/100, 4)
  * sparse phases translate without reshaping (families shift, their
  * widths and phase membership don't).
  *
  * Usage: runMain graft.tools.GenOffset <inDir> <outDir> [offset]
  */
object GenOffset {
  def main(args: Array[String]): Unit = {
    val inDir  = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val outDir = if (args.length > 1) args(1) else "/root/repo/testdata-sf001off"
    val off    = if (args.length > 2) args(2).toLong else 1000000000L
    require(off % 400L == 0L,
      s"offset must preserve the media fixtures' id/100 blocks and " +
        s"mod-4 phases (multiple of 400): $off")
    val spark = Sessions.build("graft-genoffset")

    def write(df: DataFrame, name: String): Unit =
      df.write.mode("overwrite").parquet(s"$outDir/$name.parquet")

    // dims: verbatim copies (GenScale's rule — fact FKs they serve
    // are untouched, so every dim join behaves identically)
    Seq("region", "nation", "customer", "supplier", "part").foreach { t =>
      write(Tables.load(spark, inDir, t), t)
    }
    write(Tables.orders(spark, inDir)
      .withColumn("o_orderkey", col("o_orderkey") + lit(off)), "orders")
    write(Tables.lineitem(spark, inDir)
      .withColumn("l_orderkey", col("l_orderkey") + lit(off)), "lineitem")
    write(Tables.events(spark, inDir)
      .withColumn("event_id", col("event_id") + lit(off))
      .withColumn("user_id", col("user_id") + lit(off)), "events")
    write(Tables.documents(spark, inDir)
      .withColumn("doc_id", col("doc_id") + lit(off)), "documents")
    write(Tables.embeddings(spark, inDir)
      .withColumn("vec_id", col("vec_id") + lit(off)), "embeddings")

    println(s"""{"gen":"$outDir","offset":$off}""")
    spark.stop()
  }
}
