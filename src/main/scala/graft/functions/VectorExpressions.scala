package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType}

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

  /** All `bands` sign-LSH band signatures of one quantized vector in a
    * single flat pass: plane p's sign bit is (qv · planes[p]) >= 0,
    * packed bandBits per band. One kernel call replaces bands·bandBits
    * separate `long_dot(qv, typedLit(plane))` columns — the literal-
    * per-plane form grows the plan (and the generated method) linearly
    * in the plane count, which breaks whole-stage codegen right when
    * adaptive banding needs hundreds of planes at large n. The planes
    * matrix rides along as ONE flattened reference object instead. */
  def sign_bands(qv: Column, planesFlat: Array[Long], bands: Int,
                 bandBits: Int, dim: Int): Column = {
    require(planesFlat.length == bands * bandBits * dim,
      s"planes length ${planesFlat.length} != $bands*$bandBits*$dim")
    require(bandBits >= 1 && bandBits <= 30, s"bandBits out of range: $bandBits")
    GraftSqlBridge.column(SignBandSignatures(
      GraftSqlBridge.expression(qv), planesFlat, bands, bandBits, dim))
  }

  /** Nearest centroid of a float vector among `k` UNIT-NORM centroids
    * (flattened row-major) by maximum dot product — which is maximum
    * cosine when the centroids are pre-normalized, since the row's own
    * norm is constant across candidates. One kernel call replaces k
    * literal-array cosine columns: like [[sign_bands]], the centroid
    * matrix rides along as ONE reference object, so a corpus-sized k
    * (SemDeDup auto-sizing) neither grows the plan nor breaks
    * whole-stage codegen. Ties break to the lowest centroid id;
    * deterministic for equal inputs across JVMs and retries. */
  def nearest_centroid(v: Column, centsFlat: Array[Float], k: Int,
                       dim: Int): Column = {
    require(centsFlat.length == k * dim,
      s"centroids length ${centsFlat.length} != $k*$dim")
    require(k >= 1, s"need at least one centroid, got $k")
    GraftSqlBridge.column(NearestCentroid(
      GraftSqlBridge.expression(v), centsFlat, k, dim))
  }

  def nearestCentroid(v: ArrayData, cents: Array[Float], k: Int,
                      dim: Int): Int = {
    val n = math.min(dim, v.numElements())
    var best = 0
    var bestDot = Double.NegativeInfinity
    var c = 0
    while (c < k) {
      val off = c * dim
      var acc = 0.0
      var i = 0
      while (i < n) { acc += v.getFloat(i).toDouble * cents(off + i); i += 1 }
      if (acc > bestDot) { bestDot = acc; best = c }
      c += 1
    }
    best
  }

  def signBands(qv: ArrayData, planes: Array[Long], bands: Int,
                bandBits: Int, dim: Int): ArrayData = {
    val n = math.min(dim, qv.numElements())
    val out = new Array[Int](bands)
    var p = 0
    var b = 0
    while (b < bands) {
      var sig = 0
      var k = 0
      while (k < bandBits) {
        val off = p * dim
        var acc = 0L
        var i = 0
        while (i < n) { acc += qv.getLong(i) * planes(off + i); i += 1 }
        if (acc >= 0L) sig |= (1 << k)
        k += 1
        p += 1
      }
      out(b) = sig
      b += 1
    }
    ArrayData.toArrayData(out)
  }
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

/** Packed sign-LSH band signatures over an ARRAY<BIGINT> quantized
  * vector (see [[VectorKernels.sign_bands]]). Deterministic: the plane
  * matrix is part of the expression (reference object), so equal inputs
  * give equal signatures across JVMs and retries. */
case class SignBandSignatures(child: Expression, planes: Array[Long],
                              bands: Int, bandBits: Int, dim: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"expected ARRAY<BIGINT>, got $t")
  }
  override def nullSafeEval(qv: Any): Any =
    VectorKernels.signBands(qv.asInstanceOf[ArrayData], planes, bands, bandBits, dim)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("signPlanes", planes, "long[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.VectorKernels.signBands($c, $planesRef, $bands, $bandBits, $dim)")
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** argmax-dot centroid assignment over an ARRAY<FLOAT> vector against
  * a flattened unit-norm centroid matrix (see
  * [[VectorKernels.nearest_centroid]]); reference-object matrix, same
  * plan-size rationale as [[SignBandSignatures]]. */
case class NearestCentroid(child: Expression, cents: Array[Float],
                           k: Int, dim: Int)
    extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"expected ARRAY<FLOAT>, got $t")
  }
  override def nullSafeEval(v: Any): Any =
    VectorKernels.nearestCentroid(v.asInstanceOf[ArrayData], cents, k, dim)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("centroids", cents, "float[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.VectorKernels.nearestCentroid($c, $centsRef, $k, $dim)")
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
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
