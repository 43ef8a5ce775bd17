package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** F22 `convert_to_decimal`: VDV DMS-milliseconds (`±dddmmssnnn`) →
  * decimal degrees, rounded to 6 places.
  *
  * Semantics match the reference's arithmetic
  * (`/root/reference/scripts/ads_passenger_travel_time_di.R:29-48`):
  * sign-aware integer decomposition deg = x/1e7, min = (x/1e5)%100,
  * sec = (x/1e3)%100, ms = x%1000, then
  * deg + min/60 + (sec + ms/1000)/3600, rounded HALF_UP to 6.
  *
  * Implemented as a native Catalyst `Expression` with `doGenCode` so it
  * participates in WholeStageCodegen — pure integer/double arithmetic,
  * no boxing, no UDF serialization (SURVEY.md §4 custom item 2).
  */
case class DmsToDecimalDegrees(child: Expression)
    extends UnaryExpression with Serializable {

  override def dataType: DataType = DoubleType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"DmsToDecimalDegrees expects LONG, got ${child.dataType}")
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[Long]
    DmsToDecimalDegrees.convert(v)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.DmsToDecimalDegrees.convert($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object DmsToDecimalDegrees {

  /** Static kernel shared by interpreted eval and generated code.
    * Long.MinValue (the one value `abs` cannot negate) is not a valid
    * DMS encoding — returns NaN instead of silently decomposing a
    * negative magnitude into garbage degrees. */
  def convert(v: Long): Double = {
    if (v == Long.MinValue) return Double.NaN
    val sign = if (v < 0) -1.0 else 1.0
    val x = math.abs(v)
    val deg = x / 10000000L
    val min = (x / 100000L) % 100L
    val sec = (x / 1000L) % 100L
    val ms  = x % 1000L
    val dd = deg + min / 60.0 + (sec + ms / 1000.0) / 3600.0
    // HALF_UP to 6 decimals, mirroring R round() usage in the reference
    sign * BigDecimal(dd).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  def dmsToDecimalDegrees(c: Column): Column =
    GraftSqlBridge.column(DmsToDecimalDegrees(GraftSqlBridge.expression(c)))
}
