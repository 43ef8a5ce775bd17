package graft.functions

import org.apache.spark.sql.{GraftSqlBridge, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions.Expression

/** SQL-surface registration for graft's custom Catalyst expressions, so
  * `spark.sql("SELECT simhash64(tokens) ...")` works the same as the
  * Column API — the complete-library contract (a reference user writing
  * plain SQL can reach every custom kernel).
  *
  * Two entry points, both covering the same function set:
  *  - [[GraftFunctions.register]] — imperative, current session;
  *  - [[GraftFunctions.GraftExtensions]] — a `SparkSessionExtensions`
  *    installer for `spark.sql.extensions=graft.functions.
  *    GraftFunctions$GraftExtensions` (cluster-wide, no code change in
  *    the consuming app — the Spark-idiomatic deployment shape).
  */
object GraftFunctions {

  private def arity(name: String, n: Int,
                    f: Seq[Expression] => Expression): (String, Seq[Expression] => Expression) =
    name -> { args: Seq[Expression] =>
      require(args.length == n, s"$name expects $n argument(s), got ${args.length}")
      f(args)
    }

  private[functions] val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    arity("simhash64", 1, a => SimHash64(a.head)),
    arity("ascii_clean_upper", 1, a => AsciiCleanUpper(a.head)),
    arity("rolling_hash64", 1, a => RollingHash64(a.head)),
    arity("dms_to_decimal", 1, a => DmsToDecimalDegrees(a.head)),
    arity("float_dot", 2, a => FloatVectorDot(a(0), a(1))),
    arity("float_cosine", 2, a => FloatVectorCosine(a(0), a(1))),
    arity("long_dot", 2, a => LongVectorDot(a(0), a(1))))

  /** Register every graft SQL function on an existing session. */
  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, b) =>
      GraftSqlBridge.registerFunction(spark, name, b)
    }

  /** `spark.sql.extensions` installer. Injected functions are
    * registered in the shared function registry at session build. */
  class GraftExtensions extends (SparkSessionExtensions => Unit) {
    override def apply(ext: SparkSessionExtensions): Unit =
      builders.foreach { case (name, b) =>
        ext.injectFunction(
          (org.apache.spark.sql.catalyst.FunctionIdentifier(name),
           new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
             "graft.functions.GraftFunctions", name),
           b))
      }
  }
}
