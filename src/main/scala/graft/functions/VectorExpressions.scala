package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Dense-vector kernels over `ArrayType(FloatType)` embedding columns
  * (the `embeddings.parquet` layout) as native Catalyst expressions.
  *
  * Rationale (SURVEY.md §7.3 "LLM-pipeline operators"): the built-in
  * route — `aggregate(zip_with(a, b, (x,y) => x*y), ...)` — materializes
  * a lambda-variable loop per row with boxing; a flat `while` loop over
  * the two `ArrayData` buffers inside WholeStageCodegen is the shape
  * you want when scoring 10^8+ candidate pairs (brute-force or
  * post-LSH re-rank) at 100 TB.
  */
object VectorKernels {

  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    acc
  }

  def cosine(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble; val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  def longDot(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0L
    var i = 0
    while (i < n) { acc += a.getLong(i) * b.getLong(i); i += 1 }
    acc
  }

  def float_dot(a: Column, b: Column): Column =
    GraftSqlBridge.column(FloatVectorDot(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  def float_cosine(a: Column, b: Column): Column =
    GraftSqlBridge.column(FloatVectorCosine(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  def long_dot(a: Column, b: Column): Column =
    GraftSqlBridge.column(LongVectorDot(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
}

sealed trait FloatVectorBinary extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"expected two ARRAY<FLOAT>, got ${left.dataType} / ${right.dataType}")
  }
}

/** dot(a, b) over two float vectors — codegen'd tight loop. */
case class FloatVectorDot(left: Expression, right: Expression)
    extends FloatVectorBinary {
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorKernels.dot($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** dot(a, b) over two ARRAY<BIGINT> quantized vectors — the exact
  * integer-domain scorer for oracle-checked similarity (replaces the
  * boxed `aggregate(zip_with(...))` shape; same flat-loop rationale as
  * [[FloatVectorDot]]). */
case class LongVectorDot(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"expected two ARRAY<BIGINT>, got ${left.dataType} / ${right.dataType}")
  }
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.longDot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorKernels.longDot($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** cosine(a, b) over two float vectors, 0.0 on zero-norm — codegen'd. */
case class FloatVectorCosine(left: Expression, right: Expression)
    extends FloatVectorBinary {
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorKernels.cosine($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}
