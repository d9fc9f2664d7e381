package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Spark-native registration of graft's custom Catalyst expressions, so they
  * are first-class SQL functions — usable from `spark.sql("…")`, visible to
  * `SHOW FUNCTIONS` / `DESCRIBE FUNCTION`, and codegen'd like any built-in.
  *
  * Two installation paths:
  *  - config: `spark.sql.extensions=graft.functions.GraftExtensions`
  *    (or `SparkSession.builder.withExtensions(new GraftExtensions)`) —
  *    the idiomatic cluster deployment: every session on the cluster gets
  *    the functions without code changes;
  *  - [[GraftExtensions.register]] on an already-running session (test and
  *    notebook convenience; same registry, same expressions).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach { case (ident, info, builder) =>
      ext.injectFunction((ident, info, builder))
    }
    ext.injectOptimizerRule(_ => RewriteMd5Prefix60)
  }
}

object GraftExtensions {

  /** (identifier, catalog info, builder) for every graft SQL function. */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("md5_prefix60"),
      new ExpressionInfo(classOf[Md5Prefix60].getName, null, "md5_prefix60",
        "md5_prefix60(str) - first 60 bits of md5(str) as a non-negative BIGINT; " +
          "the engine's portable text-hash primitive (equals " +
          "conv(substring(md5(str),1,15),16,10) at ~1/3 the cost).",
        ""),
      (args: Seq[Expression]) => {
        require(args.length == 1, s"md5_prefix60 expects 1 argument, got ${args.length}")
        Md5Prefix60(args.head)
      }),
    (FunctionIdentifier("quantized_dot"),
      new ExpressionInfo(classOf[QuantizedDot].getName, null, "quantized_dot",
        "quantized_dot(a, b) - exact-integer embedding score: " +
          "sum(floor(a_i*10000)*floor(b_i*10000)) over two float/double arrays as BIGINT.",
        ""),
      (args: Seq[Expression]) => {
        require(args.length == 2, s"quantized_dot expects 2 arguments, got ${args.length}")
        QuantizedDot(args.head, args(1))
      }))

  /** Register into a live session's function registry (idempotent). */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    }
}
