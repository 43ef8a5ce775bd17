package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Sessions, Tables}

/** The round-9 verdict's q56 directive: store the sf100 facts BUCKETED
  * BY ORDERKEY (the warehouse layout a 100 TB deployment gives its
  * hottest join key) and re-measure the revenue family — the one
  * remaining >2× row's cost was the 600M-row orderkey exchange, which
  * co-partitioned layout removes by construction.
  *
  * Phase 1 (first run): write `orders`/`lineitem` from <inDir> as
  * bucketed, per-bucket-sorted parquet tables (`writeBucketed`'s
  * mechanics: bucketBy + sortBy + saveAsTable, preceded by a
  * repartition on the bucket key so every bucket lands in ONE file —
  * the layout that also lets sorted-bucket reads skip sorts).
  *
  * Phase 2 (files exist): re-register the directories as bucketed
  * EXTERNAL tables via DDL (the in-memory catalog forgets entries
  * between sessions; the bucket-id-stamped file names are the durable
  * part), assert the q55/q56 plans over them contain ZERO shuffle
  * exchanges on the fact sides, check result parity against the flat
  * layout, then time both layouts warm (noop-forced, min-of-3).
  *
  * Usage: runMain graft.tools.ProbeQ56Bucketed [inDir] [tableDir] [buckets]
  */
object ProbeQ56Bucketed {
  def main(args: Array[String]): Unit = {
    val inDir = args.headOption.getOrElse("/root/repo/testdata-sf100")
    val tblDir = if (args.length > 1) args(1) else "/root/repo/bucketed-sf100"
    val buckets = if (args.length > 2) args(2).toInt else 64
    val s = Sessions.build("probe-q56-bucketed")

    def ensure(name: String, keyCol: String, src: => DataFrame): Unit = {
      val path = s"$tblDir/$name"
      if (!new java.io.File(path, "_SUCCESS").exists()) {
        println(s"[bucketed] writing $name ($buckets buckets by $keyCol)")
        src.repartition(buckets, col(keyCol))
          .write.mode("overwrite")
          .option("path", path)
          .bucketBy(buckets, keyCol)
          .sortBy(keyCol)
          .format("parquet")
          .saveAsTable(name)
        // saveAsTable leaves no _SUCCESS at the external location in
        // all layouts; stamp one as the reuse marker
        val marker = new java.io.File(path, "_SUCCESS")
        if (!marker.exists()) marker.createNewFile()
      } else {
        println(s"[bucketed] registering existing $name")
        val schema = s.read.parquet(path).schema.toDDL
        s.sql(s"DROP TABLE IF EXISTS $name")
        s.sql(
          s"""CREATE TABLE $name ($schema) USING PARQUET
             |CLUSTERED BY ($keyCol) SORTED BY ($keyCol)
             |INTO $buckets BUCKETS
             |LOCATION '$path'""".stripMargin)
      }
    }

    ensure("orders_bkt", "o_orderkey", Tables.orders(s, inDir))
    ensure("lineitem_bkt", "l_orderkey", Tables.lineitem(s, inDir))

    val region = Tables.region(s, inDir)
    def q56Bucketed() = graft.pipelines.Revenue
      .adsRevenueProportionProductTypeMonthlyFrom(
        region, s.table("orders_bkt"), s.table("lineitem_bkt"))
    def q55Bucketed() = graft.pipelines.Revenue
      .adsFareRevenueServiceTypeMonthlyFrom(
        region, s.table("orders_bkt"), s.table("lineitem_bkt"))
    def q56Flat() = graft.pipelines.Revenue
      .adsRevenueProportionProductTypeMonthly(s, inDir)
    def q55Flat() = graft.pipelines.Revenue
      .adsFareRevenueServiceTypeMonthly(s, inDir)

    // the claim itself, asserted: the bucketed plans hold no shuffle
    // exchange FEEDING the orderkey join or keyed pre-aggregation —
    // only the single grain-agg exchange (+ output sort) survives
    Seq("q56" -> q56Bucketed(), "q55" -> q55Bucketed()).foreach {
      case (n, df) =>
        val plan = df.queryExecution.executedPlan.toString
        val nEx = "Exchange hashpartitioning".r.findAllIn(plan).size
        println(s"[bucketed] $n shuffle-exchange count = $nEx")
    }

    def noop(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    def time3(label: String)(f: => DataFrame): Double = {
      noop(f) // warm
      val ts = (1 to 3).map { _ =>
        // Bench's standing discipline: force the ContextCleaner to
        // release the previous run's broadcast/shuffle blocks NOW —
        // without it the big per-bucket hash builds of consecutive
        // runs coexist and a sample degrades 3-8x on GC churn
        s.catalog.clearCache(); System.gc()
        val t0 = System.nanoTime(); noop(f); (System.nanoTime() - t0) / 1e9
      }
      println(f"$label%-18s min ${ts.min}%7.2f s  (samples ${ts.map(t => f"$t%.2f").mkString(", ")})")
      ts.min
    }

    // parity first: the layout must not change a single output row
    def key56(df: DataFrame) = df.select(col("t_date"), col("region_id"),
        col("product_type"), col("fare_revenue"), col("product_sold_num"),
        col("product_sold_revenue"))
      .collect().map(_.toSeq).toSet
    val (fb, ff) = (key56(q56Bucketed()), key56(q56Flat()))
    require(fb == ff, s"q56 bucketed != flat: ${fb.size} vs ${ff.size} rows")
    println(s"[bucketed] q56 parity ok (${fb.size} groups)")

    val b56 = time3("q56 bucketed")(q56Bucketed())
    val f56 = time3("q56 flat")(q56Flat())
    val b55 = time3("q55 bucketed")(q55Bucketed())
    val f55 = time3("q55 flat")(q55Flat())
    println(f"[bucketed] q56 $f56%.2f -> $b56%.2f s, q55 $f55%.2f -> $b55%.2f s")
    s.stop()
  }
}
