package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Compressibility as a quality signal: `compression_ratio(text)` →
  * ⌊deflated_bytes · 10⁴ / raw_bytes⌋ (basis points, ~10000 ≈
  * incompressible). Highly repetitive machine-generated text (template
  * spam, keyword stuffing, boilerplate floods) deflates far below natural
  * prose — the MassiveText/RefinedWeb-style "compression ratio" filter,
  * cheap enough to run over every document because it never leaves the
  * scan stage.
  *
  * Determinism contract: deflate with FIXED level (6) and default
  * strategy over the raw UTF-8 bytes — byte-identical for a given zlib
  * build, stable across partitionings and executors of one cluster
  * (same JDK). No SQL replays zlib, but the driver gate is differential
  * anyway (r8): fixtures/ holds the expected output computed by the
  * C-zlib python binding (raw deflate, level 6, wbits −15 — the exact
  * Deflater(6, nowrap) configuration), an independent derivation the
  * oracle reads back; the spec pins the semantics besides.
  *
  * Execution: one doGenCode'd static call inside whole-stage codegen;
  * the Deflater and scratch buffer are thread-local and reset per row —
  * no per-row allocation, no UDF, never throws.
  */
case class CompressionRatio(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"compression_ratio requires a string or binary argument, got ${other.catalogString}")
  }

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "compression_ratio"

  private def isString = child.dataType == StringType

  override protected def nullSafeEval(v: Any): Any =
    if (isString) CompressionRatio.ratioBp(v.asInstanceOf[UTF8String].getBytes)
    else CompressionRatio.ratioBp(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    if (isString)
      defineCodeGen(ctx, ev, v => s"graft.functions.CompressionRatio.ratioBp($v.getBytes())")
    else
      defineCodeGen(ctx, ev, v => s"graft.functions.CompressionRatio.ratioBp($v)")

  override protected def withNewChildInternal(newChild: Expression): CompressionRatio =
    copy(child = newChild)
}

object CompressionRatio {

  /** Column form. */
  def apply(c: Column): Column =
    GraftBridge.column(CompressionRatio(GraftBridge.expression(c)))

  private val deflater = ThreadLocal.withInitial[java.util.zip.Deflater](() =>
    new java.util.zip.Deflater(6, /* nowrap = */ true))
  private val scratch = ThreadLocal.withInitial[Array[Byte]](() => new Array[Byte](8192))

  /** Codegen entry point: deflated size in basis points of the raw size.
    * Empty input is defined as 10000 (nothing to compress). Never throws.
    */
  def ratioBp(raw: Array[Byte]): Int = {
    if (raw == null || raw.length == 0) return 10000
    val d = deflater.get()
    d.reset()
    d.setInput(raw)
    d.finish()
    val buf = scratch.get()
    var compressed = 0L
    while (!d.finished()) {
      compressed += d.deflate(buf)
    }
    math.min(Int.MaxValue.toLong, compressed * 10000L / raw.length).toInt
  }
}
