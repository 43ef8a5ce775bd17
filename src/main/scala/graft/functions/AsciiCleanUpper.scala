package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** F1 `deep_clean` as a single codegen'd byte scan: keep `[A-Za-z0-9]`,
  * uppercase — exactly `upper(regexp_replace(trim(c), "[^A-Za-z0-9]",
  * ""))` (reference behavior:
  * `scripts/ads_passenger_travel_info_mi.py:145-148`), without the
  * per-row Java regex machine.
  *
  * Equivalence argument: `trim` only removes characters the regex
  * deletes anyway, so it is algebraically redundant; every byte of a
  * multi-byte UTF-8 code point has the high bit set and therefore
  * falls outside `[0-9A-Za-z]`, so a byte-level filter drops exactly
  * the code points the regex drops; uppercasing the surviving pure-
  * ASCII bytes equals `upper` on the surviving string. The DuckDB
  * oracles keep the regex form — the hash-parity gate pins the
  * equivalence on every cleaned key.
  *
  * Motivation: the clean runs on EVERY fact row (join/group key of the
  * ads pipelines, twice per row counting the dim build). At 100 TB the
  * regex version burns ~1 µs/row of pure driver-payable CPU; this scan
  * is ~20 ns and stays inside WholeStageCodegen either way.
  */
case class AsciiCleanUpper(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"expected STRING, got $t")
  }
  override def nullSafeEval(input: Any): Any =
    AsciiCleanUpper.compute(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.AsciiCleanUpper.compute($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object AsciiCleanUpper {

  /** Shared by generated and interpreted eval — one implementation, no
    * drift between paths. */
  def compute(s: UTF8String): UTF8String = {
    val bytes = s.getBytes
    val out = new Array[Byte](bytes.length)
    var n = 0
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i)
      if ((b >= '0' && b <= '9') || (b >= 'A' && b <= 'Z')) {
        out(n) = b; n += 1
      } else if (b >= 'a' && b <= 'z') {
        out(n) = (b - 32).toByte; n += 1
      }
      i += 1
    }
    UTF8String.fromBytes(out, 0, n)
  }

  def asciiCleanUpper(c: Column): Column =
    GraftSqlBridge.column(AsciiCleanUpper(GraftSqlBridge.expression(c)))
}
