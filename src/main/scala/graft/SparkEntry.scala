package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.core.Sessions

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query implementations live under [[graft.queries]]; each module
  * contributes `Seq[QueryDef]` and this object flattens them into the
  * driver-facing maps.
  */
object SparkEntry {

  def registry: Seq[QueryDef] =
    queries_registry

  private lazy val queries_registry: Seq[QueryDef] =
    graft.queries.CoreAnalytics.all ++
    graft.queries.EventFlows.all ++
    graft.queries.ScalarShapes.all ++
    graft.queries.LlmPipelines.all ++
    graft.queries.SystemShapes.all ++
    graft.queries.AdsPipelines.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    graft.queries.CoreAnalytics.q1.fn(Sessions.tune(spark), "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> ((s: SparkSession, d: String) => q.fn(Sessions.tune(s), d))).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap

  /** Headline subset timed by graft.Bench. */
  def benchQueries: Seq[QueryDef] = registry.filter(_.bench)
}
