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

  /** Register an expression builder as a SQL function on this session. */
  def registerFunction(spark: SparkSession, name: String,
                       builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, builder, "scala_udf")
}
