package graft.tools

import org.apache.spark.sql.functions._
import graft.core.{Sessions, Tables}

/** Dev probe (SCALE.md round-9): does pre-aggregating q56's legs into
  * 7 per-order product slots (join probe 600M → 150M rows, but ~5×
  * wider shuffle rows) beat the shipped shape (slim rows, full-volume
  * probe)? Both forms computed to the same grain, noop-forced, warm. */
object ProbeQ56Wide {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("testdata-sf100")
    val s = Sessions.build("probe-q56-wide")
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$label%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }

    def current() = graft.pipelines.Revenue
      .adsRevenueProportionProductTypeMonthly(s, dir)

    def wide2() = {
      val ord = Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_custkey"),
          (year(col("o_orderdate")) * 100 + month(col("o_orderdate"))).as("ym"))
      val legs = Tables.lineitem(s, dir)
        .select(col("l_orderkey"),
          (col("l_partkey") % 7).cast("int").as("pidx"),
          round(col("l_quantity")).cast("long").as("qty"),
          round(col("l_extendedprice") * 100).cast("long").as("ext"),
          round(col("l_discount") * 100).cast("long").as("disc"))
        .withColumn("net", graft.ops.Cleaning.intDiv(
          col("ext") * (lit(100L) - col("disc")), lit(100L)))
      val slotAggs = (0 until 7).flatMap { p =>
        Seq(sum(when(col("pidx") === p, col("qty")).otherwise(0L)).as(s"q$p"),
          sum(when(col("pidx") === p, col("ext")).otherwise(0L)).as(s"e$p"),
          sum(when(col("pidx") === p, col("net")).otherwise(0L)).as(s"n$p"),
          sum(when(col("pidx") === p, 1L).otherwise(0L)).as(s"c$p"))
      }
      val perOrder = legs.groupBy(col("l_orderkey"))
        .agg(slotAggs.head, slotAggs.tail: _*)
      val reAggs = (0 until 7).flatMap(p => Seq(
        sum(col(s"q$p")).as(s"q$p"), sum(col(s"e$p")).as(s"e$p"),
        sum(col(s"n$p")).as(s"n$p"), sum(col(s"c$p")).as(s"c$p")))
      val grouped = perOrder
        .join(ord.hint("shuffle_hash"), col("l_orderkey") === col("o_orderkey"))
        .groupBy((col("o_custkey") % 5).as("rkey"), col("ym"))
        .agg(reAggs.head, reAggs.tail: _*)
      val unpivoted = grouped.select(col("rkey"), col("ym"),
        explode(array((0 until 7).map(p => struct(
          lit(p).as("pidx"), col(s"q$p").as("qty"), col(s"e$p").as("ext"),
          col(s"n$p").as("net"), col(s"c$p").as("cnt"))): _*)).as("s"))
        .select(col("rkey"), col("ym"), col("s.pidx"), col("s.qty"),
          col("s.ext"), col("s.net"), col("s.cnt"))
        .where(col("cnt") > 0)
      unpivoted
    }

    // warm scans once
    noop(current()); val _ = wide2().count()
    time("current warm")(noop(current()))
    time("wide warm")(noop(wide2()))
    time("current warm2")(noop(current()))
    time("wide warm2")(noop(wide2()))
    // result parity: wide grain sums == shipped grain sums
    val a = current().select(col("t_date"), col("region_id"),
      col("product_type"), col("product_sold_num")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSet
    println(s"current groups=${a.size}")
    val b = wide2().count()
    println(s"wide groups=$b (must equal)")
    s.stop()
  }
}
