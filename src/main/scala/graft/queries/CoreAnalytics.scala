package graft.queries

import graft.QueryDef
import graft.core.Tables
import graft.ops.Cleaning
import org.apache.spark.sql.functions._

/** Core scan/aggregate/join capabilities (SURVEY.md §2.1 S1-S3, §2.2,
  * §2.3 J1-J2, §2.4 A1-A3).
  *
  * Each query is the Spark-first restatement of a reference pipeline
  * shape; the DuckDB oracle is the same ANSI SQL the driver hash-checks.
  * All results carry an explicit ORDER BY on the full key so the compare
  * is deterministic.
  */
object CoreAnalytics {

  /** A1+A3+A16 — multi-metric grouped aggregation (pricing-summary
    * shape). Mirrors the reference's chunked accumulate pipeline
    * (`scripts/ads_passenger_travel_info_mi.py:253-344`): Spark's
    * partial+final hash aggregation replaces the manual chunk loop
    * (SURVEY.md §2.9 ST1). One shuffle on the two group keys; at 100 TB
    * this is map-side combined so shuffle volume is |groups|, not |rows|.
    */
  val q1 = QueryDef(
    "q01_agg_pricing_summary",
    (s, dir) => {
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          count(lit(1)).as("cnt"),
          // exact integer domains throughout (qty/price/discount are
          // 2-decimal by data contract): double sums are order-
          // dependent in the last bit, flipping round-half ties
          // cross-engine — the measured q47/q51 defect class
          Cleaning.sumExact2(col("l_quantity")).as("sum_qty"),
          Cleaning.sumExact2(col("l_extendedprice")).as("sum_base_price"),
          // price·(1-disc) in the e4 domain: cents × (100-disc_cents),
          // genuinely rounded (4 decimals → 2) half-up via one
          // integral divide. The e4-scaled per-row terms reach ~1e9, so
          // the SUM accumulates in decimal (exact, order-free, no Long
          // wrap at extreme row counts — DuckDB's HUGEINT twin likewise)
          Cleaning.roundHalfUpRatio(
            sum((round(col("l_extendedprice") * 100).cast("long") *
              (lit(100L) - round(col("l_discount") * 100).cast("long")))
              .cast("decimal(28,0)")),
            lit(100L), 2).as("sum_disc_price"),
          // avg = cents_sum/(100·n); ·10^2 cancels to cents_sum/n
          Cleaning.roundHalfUpRatio(
            sum(round(col("l_quantity") * 100).cast("long")),
            count(lit(1)), 2).as("avg_qty"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },
    Some("""SELECT l_returnflag, l_linestatus,
           |  CAST(count(*) AS BIGINT) AS cnt,
           |  CAST(SUM(CAST(round(l_quantity*100) AS BIGINT)) AS DOUBLE) / 100.0
           |    AS sum_qty,
           |  CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)) AS DOUBLE) / 100.0
           |    AS sum_base_price,
           |  CAST((2*SUM(CAST(round(l_extendedprice*100) AS BIGINT)
           |              * (100 - CAST(round(l_discount*100) AS BIGINT))) + 100)
           |       // 200 AS DOUBLE) / 100.0 AS sum_disc_price,
           |  CAST((2*SUM(CAST(round(l_quantity*100) AS BIGINT)) + count(*))
           |       // (2*count(*)) AS DOUBLE) / 100.0 AS avg_qty
           |FROM lineitem
           |GROUP BY l_returnflag, l_linestatus
           |ORDER BY l_returnflag, l_linestatus""".stripMargin))

  /** S1+S3+P1+P6 — projected scan with a pushed date-range predicate
    * (`scripts/ads_route_passenger_trips_di- first 6 months
    * 2025.py:79-84` does this by hand with pyarrow dataset filters;
    * Catalyst pushes both the filter and the 4-column projection into
    * the parquet scan — verified via PushedFilters in explain).
    */
  val q2 = QueryDef(
    "q02_scan_pushdown",
    (s, dir) => {
      Tables.lineitem(s, dir)
        .where(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
               col("l_shipdate") <  lit("1995-07-01").cast("timestamp"))
        .select(
          col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          date_format(col("l_shipdate"), "yyyy-MM-dd").as("ship_date"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    },
    Some("""SELECT l_orderkey, l_linenumber, l_quantity,
           |  strftime(l_shipdate, '%Y-%m-%d') AS ship_date
           |FROM lineitem
           |WHERE l_shipdate >= TIMESTAMP '1995-01-01'
           |  AND l_shipdate <  TIMESTAMP '1995-07-01'
           |ORDER BY l_orderkey, l_linenumber""".stripMargin))

  /** J1+J2 — fact × small-dim broadcast join chain with aggregation
    * (the reference's AFC×LINE×OPERATING_DEPARTMENT merge,
    * `scripts/ads_passenger_travel_info_mi.py:134-177`). Dims are
    * explicitly broadcast: no shuffle of the fact side for the join, the
    * only shuffle is the final aggregation — the correct shape at 100 TB
    * where customer is large and nation/region are tiny.
    */
  val q3 = QueryDef(
    "q03_join_broadcast_dims",
    (s, dir) => {
      val cust = Tables.customer(s, dir)
      val nat  = broadcast(Tables.nation(s, dir))
      val reg  = broadcast(Tables.region(s, dir))
      cust
        .join(nat, cust("c_nationkey") === nat("n_nationkey"), "left")
        .join(reg, nat("n_regionkey") === reg("r_regionkey"), "left")
        .groupBy(col("r_name"), col("n_name"))
        .agg(
          count(lit(1)).as("num_customers"),
          // exact cents sum (see q01): order-independent, tie-free
          Cleaning.sumExact2(col("c_acctbal")).as("total_acctbal"))
        .orderBy(col("r_name"), col("n_name"))
    },
    Some("""SELECT r_name, n_name,
           |  CAST(count(*) AS BIGINT) AS num_customers,
           |  CAST(SUM(CAST(round(c_acctbal*100) AS BIGINT)) AS DOUBLE) / 100.0
           |    AS total_acctbal
           |FROM customer
           |LEFT JOIN nation ON c_nationkey = n_nationkey
           |LEFT JOIN region ON n_regionkey = r_regionkey
           |GROUP BY r_name, n_name
           |ORDER BY r_name, n_name""".stripMargin))

  val all: Seq[QueryDef] = Seq(q1, q2, q3)
}
