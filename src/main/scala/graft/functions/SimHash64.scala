package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash over a token array — near-duplicate fingerprinting
  * (Charikar 2002 random-hyperplane rounding; the classic web-dedup
  * construction also used by Google's Manku/Jain/Sarma WWW'07 paper).
  *
  * Each token is hashed to 64 bits (two seeded 32-bit Murmur-style
  * passes), each bit contributes ±1 to its lane, and the sign per lane
  * forms the fingerprint. Near-duplicate docs differ in few bits, so
  * Hamming-band bucketing (e.g. 4×16-bit bands) finds candidates with
  * one shuffle per band — the at-scale alternative to all-pairs
  * comparison. Deterministic across JVMs (no Random).
  */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"expected ARRAY<STRING>, got $t")
  }
  override def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash64.compute($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash64 {

  /** 64-bit token hash: xxhash-style avalanche over the UTF-8 bytes.
    * Self-contained so generated code and interpreted eval agree. */
  def hash64(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 0x9E3779B97F4A7C15L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xFFL)
      h *= 0xC2B2AE3D27D4EB4FL
      h = java.lang.Long.rotateLeft(h, 31)
      i += 1
    }
    h ^= h >>> 33; h *= 0xFF51AFD7ED558CCDL; h ^= h >>> 33
    h
  }

  def compute(tokens: ArrayData): Long = {
    val counts = new Array[Int](64)
    val n = tokens.numElements()
    var t = 0
    while (t < n) {
      if (!tokens.isNullAt(t)) {
        val h = hash64(tokens.getUTF8String(t))
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      t += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  def simhash64(tokens: Column): Column =
    GraftSqlBridge.column(SimHash64(GraftSqlBridge.expression(tokens)))
}
