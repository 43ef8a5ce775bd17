package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-CODE-POINT polynomial string checksum in the exact cross-engine
  * hash family the oracles replay (`(acc·31 + cp) mod (2^31 − 1)`,
  * seed 7 — [[QualityScore64]]'s word-fold, here over a whole string's
  * code points): the q90 content checksum that pins a rewritten
  * document character-for-character on both engines.
  *
  * Why an Expression and not
  * `aggregate(transform(sequence(1, length(s)), i -> ascii(substr(s, i, 1))), 7, ...)`:
  * the HOF form materializes a per-character LONG ARRAY for every
  * document and runs the fold interpreted — an allocation per
  * character on the hot path of a corpus-wide rewrite check. This
  * kernel is one code-point walk, zero allocation beyond the string
  * decode, codegen'd; parity with the HOF chain and with DuckDB's
  * `ord(substr(...))` replay holds because all three step by Unicode
  * CODE POINT (not UTF-16 unit, not byte). Codegen and interpreted
  * eval share [[PolyHash31.compute]], asserted equal in
  * CodegenParitySpec.
  */
case class PolyHash31(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"expected STRING, got $t")
  }
  override def nullSafeEval(input: Any): Any =
    PolyHash31.compute(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PolyHash31.compute($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PolyHash31 {

  final val Seed = 7L
  final val Mod = 2147483647L // 2^31 − 1

  def compute(s: UTF8String): Long = {
    val str = s.toString
    var acc = Seed
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      acc = (acc * 31L + cp) % Mod
      i += Character.charCount(cp)
    }
    acc
  }

  def poly_hash31(s: Column): Column =
    GraftSqlBridge.column(PolyHash31(GraftSqlBridge.expression(s)))
}
