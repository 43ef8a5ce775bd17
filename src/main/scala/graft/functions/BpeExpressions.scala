package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The per-word rewrite step of BPE merge training (Sennrich et al.
  * 2016 §3.2): greedy LEFT-TO-RIGHT replacement of every adjacent
  * (left, right) symbol pair with their concatenation — one codegen'd
  * pass over the symbol array, the round's chosen pair riding along
  * as UTF8String reference objects (the [[NearestCentroid]] pattern;
  * a per-round lambda-UDF would box every symbol of every word every
  * round). Greedy left-to-right is the reference semantics: in
  * `a a a` with merge (a,a) the first two symbols fuse and the third
  * survives. */
object BpeKernels {

  def eval(syms: ArrayData, l: UTF8String, r: UTF8String,
           m: UTF8String): ArrayData = {
    val n = syms.numElements()
    val buf = new Array[AnyRef](n)
    var i = 0
    var k = 0
    while (i < n) {
      if (i + 1 < n && l.equals(syms.getUTF8String(i)) &&
          r.equals(syms.getUTF8String(i + 1))) {
        buf(k) = m; i += 2
      } else {
        buf(k) = syms.getUTF8String(i); i += 1
      }
      k += 1
    }
    new GenericArrayData(
      if (k == n) buf else java.util.Arrays.copyOf(buf, k))
  }

  /** Column API: `syms` with every adjacent (left, right) merged. */
  def merge_pair(syms: Column, left: String, right: String): Column =
    GraftSqlBridge.column(MergeAdjacentPair(
      GraftSqlBridge.expression(syms), left, right))
}

/** See [[BpeKernels]]; codegen'd, null-preserving. */
case class MergeAdjacentPair(child: Expression, left: String, right: String)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"expected ARRAY<STRING>, got $t")
  }
  @transient private lazy val lU = UTF8String.fromString(left)
  @transient private lazy val rU = UTF8String.fromString(right)
  @transient private lazy val mU = UTF8String.fromString(left + right)
  override def nullSafeEval(syms: Any): Any =
    BpeKernels.eval(syms.asInstanceOf[ArrayData], lU, rU, mU)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = "org.apache.spark.unsafe.types.UTF8String"
    val lRef = ctx.addReferenceObj("bpeLeft", lU, cls)
    val rRef = ctx.addReferenceObj("bpeRight", rU, cls)
    val mRef = ctx.addReferenceObj("bpeMerged", mU, cls)
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.BpeKernels.eval($c, $lRef, $rRef, $mRef)")
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}
