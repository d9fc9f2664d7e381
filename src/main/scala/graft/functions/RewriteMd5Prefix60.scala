package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{BinaryType, IntegerType, LongType, StringType}

/** Optimizer rule: collapse the engine's PORTABLE 60-bit-hash idiom
  * `cast(conv(substring(md5(s), 1, 15), 16, 10) as bigint)` into the native
  * codegen'd [[Md5Prefix60]] expression.
  *
  * Why a rule and not just the fast Column helper: the portable form is the
  * one any SQL client (or the DuckDB oracle replay) writes — users who feed
  * the engine plain SQL still get the native expression, without knowing it
  * exists. Pattern is exact (positions 1/15, bases 16/10, long cast), so the
  * rewrite can never fire on a semantically different conv. Injected via
  * [[GraftExtensions]] (`injectOptimizerRule`) or
  * `spark.experimental.extraOptimizations`.
  */
object RewriteMd5Prefix60 extends Rule[LogicalPlan] {

  private object IntLit {
    def unapply(e: Expression): Option[Int] = e match {
      case Literal(v: Int, IntegerType) => Some(v)
      case _ => None
    }
  }

  /** md5(string_col) arrives as Md5(Cast(s, BinaryType)) from the implicit
    * string→binary cast the analyzer inserts.
    */
  private object Md5OfString {
    def unapply(e: Expression): Option[Expression] = e match {
      case Md5(Cast(s, BinaryType, _, _)) if s.dataType == StringType => Some(s)
      case Md5(s) if s.dataType == StringType => Some(s)
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case Cast(Conv(Substring(Md5OfString(s), IntLit(1), IntLit(15)),
                   IntLit(16), IntLit(10), _), LongType, _, _) =>
      Md5Prefix60(s)
  }
}
