package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine capability exposed to the driver's correctness/bench gates.
  *
  * @param name    stable key — appears in CORRECTNESS_r{N}.json / BENCH
  * @param fn      (session, sfDir) => result; must be deterministic and
  *                ordered (the oracle hash compare is order-sensitive)
  * @param oracle  equivalent ANSI SQL for DuckDB over the same parquet
  *                tables; None → driver records a rows-only check
  * @param bench   include in the headline benchmark set
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    bench: Boolean = true)
