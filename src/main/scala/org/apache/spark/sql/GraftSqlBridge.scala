package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge into `private[sql]` helpers so graft's custom Catalyst
  * expressions can be exposed as user-facing `Column`s — the standard
  * extension idiom for libraries built on Spark (the public API offers
  * no Expression→Column constructor since the 4.x Column/ColumnNode
  * split).
  */
object GraftSqlBridge {

  /** Wrap a raw Catalyst expression as a Column. */
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)

  /** Extract the Catalyst expression backing a Column (requires an
    * active classic SparkSession, which all graft entry points have). */
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Re-root a DataFrame's logical plan onto `spark` (same
    * SparkContext/SharedState, different SessionState) so an operator
    * that tunes session conf for an iterative loop can run inside a
    * `newSession()` clone — its conf changes invisible to queries
    * running concurrently on the caller's session — and hand the result
    * back on the caller's session. Cached data is shared (CacheManager
    * lives in SharedState), so persist/unpersist work across the pair.
    *
    * Re-roots the ANALYZED plan, not the raw logical one: resolved
    * nodes survive the target session's analyzer untouched, so a frame
    * referencing the CALLER's temp views, `spark.sql` text, or
    * session-registered functions rebases cleanly — re-analyzing the
    * unresolved form on a fresh SessionState would fail to find any of
    * those (they live in the caller's catalog, not the clone's). */
  def rebase(spark: SparkSession, df: DataFrame): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession],
      df.asInstanceOf[classic.Dataset[Row]].queryExecution.analyzed)

  /** Register an expression builder as a SQL function on this session. */
  def registerFunction(spark: SparkSession, name: String,
                       builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, builder, "scala_udf")
}
