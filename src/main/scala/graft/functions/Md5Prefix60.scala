package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the engine's portable 60-bit text hash:
  * the first 15 hex digits of md5 as a Long — semantically identical to
  * `conv(substring(md5(c), 1, 15), 16, 10)` but computed directly from the
  * digest bytes (no hex-string materialization, no Decimal radix
  * conversion), with codegen. The built-in chain costs 3 expression nodes +
  * a 32-char string + a Decimal per call; dedup/minhash evaluates this once
  * per SHINGLE, so the constant factor is the operator's hot loop.
  *
  * Cross-engine contract unchanged: DuckDB replays
  * `CAST(('0x'||substr(md5(x),1,15)) AS BIGINT)` — the differential gate
  * pins both paths to the same value.
  */
case class Md5Prefix60(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"md5_prefix60 requires a string argument, got ${child.dataType.catalogString}")
  override def dataType: DataType = LongType
  override def prettyName: String = "md5_prefix60"

  override protected def nullSafeEval(input: Any): Any =
    Md5Prefix60.hash60(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5Prefix60.hash60($c)")

  override protected def withNewChildInternal(newChild: Expression): Md5Prefix60 =
    copy(child = newChild)
}

object Md5Prefix60 {
  private val md = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  /** First 15 hex nibbles of md5(bytes) = bytes 0..6 plus the high nibble of
    * byte 7, packed big-endian — exactly what conv(substring(hex,1,15),16,10)
    * parses. 60 bits, always non-negative.
    */
  def hash60(s: UTF8String): Long = {
    val d = md.get()
    d.reset()
    val h = d.digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (h(i) & 0xffL); i += 1 }
    (v << 4) | ((h(7) & 0xffL) >>> 4)
  }

  /** Column form. */
  def apply(c: Column): Column = GraftBridge.column(Md5Prefix60(GraftBridge.expression(c)))
}
