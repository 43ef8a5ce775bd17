package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Polynomial (Rabin-Karp) rolling hash over a token array:
  * h = Σ crc32(tok_i) · B^(n-1-i) with base B = 1000003, in wrap-around
  * 64-bit arithmetic — an ORDER-SENSITIVE document fingerprint (the md5
  * canonical fingerprint hashes the token bag's joined text; two
  * reorderings of the same tokens collide there, never here except by
  * 2^-64 accident).
  *
  * Why an Expression and not `aggregate(tokens, 0L, acc*B + crc32(t))`:
  * the HOF form runs interpreted AND its multiply throws under ANSI
  * semantics (Spark 4 default) the moment the polynomial exceeds
  * Long.MaxValue — wrap-around is the DEFINITION of this hash, so the
  * arithmetic must be Java's, not SQL's. Codegen and interpreted eval
  * share [[RollingHash64.compute]], asserted equal in
  * CodegenParitySpec.
  */
case class RollingHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"expected ARRAY<STRING>, got $t")
  }
  override def nullSafeEval(input: Any): Any =
    RollingHash64.compute(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RollingHash64.compute($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RollingHash64 {

  final val Base = 1000003L

  def compute(tokens: ArrayData): Long = {
    val n = tokens.numElements()
    var h = 0L
    var i = 0
    val crc = new java.util.zip.CRC32()
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        crc.reset()
        val b = tokens.getUTF8String(i).getBytes
        crc.update(b, 0, b.length)
        h = h * Base + crc.getValue // wrap-around on purpose
      }
      i += 1
    }
    h
  }

  def rollingHash64(tokens: Column): Column =
    GraftSqlBridge.column(RollingHash64(GraftSqlBridge.expression(tokens)))
}
