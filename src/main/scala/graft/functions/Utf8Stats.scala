package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._

/** UTF-8 validity & mojibake statistics over a raw BINARY payload —
  * `utf8_stats(bin)` → `struct<n_bytes, n_chars, n_invalid,
  * n_replacement>` — the text-QA probe that runs BEFORE decoding in a
  * binary ingest pipeline ([[MediaDims]]/[[AudioMeta]] route media;
  * this triages text blobs): n_invalid > 0 means the payload is not
  * clean UTF-8 (wrong charset, binary junk, truncated write);
  * n_replacement > 0 means someone already decoded it LOSSILY upstream
  * (U+FFFD markers baked in — the classic double-decode mojibake
  * signature) — two different failure modes a corpus audit must
  * distinguish, neither visible once Spark has decoded the column to
  * a string.
  *
  * Semantics (strict RFC 3629, declared): 1–4-byte sequences with the
  * E0/ED/F0/F4 second-byte restrictions (overlongs and surrogates are
  * invalid); an invalid byte counts ONE and the walk resyncs at the
  * next byte (so a C0 80 overlong counts 2, an ED A0 80 surrogate
  * counts 3); a truncated trailing sequence counts its lead byte
  * invalid. `n_chars` counts decoded characters (replacement chars
  * included — they are valid UTF-8). One doGenCode static call, O(n)
  * per payload, never throws.
  */
case class Utf8Stats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"utf8_stats requires a binary argument, got ${other.catalogString}")
  }

  override def dataType: DataType = Utf8Stats.Schema
  override def nullable: Boolean = true
  override def prettyName: String = "utf8_stats"

  override protected def nullSafeEval(v: Any): Any =
    Utf8Stats.parseRow(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => s"""
      ${ev.value} = graft.functions.Utf8Stats.parseRow($v);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): Utf8Stats =
    copy(child = newChild)
}

object Utf8Stats {
  val Schema: StructType = StructType(Seq(
    StructField("n_bytes", LongType, nullable = false),
    StructField("n_chars", LongType, nullable = false),
    StructField("n_invalid", LongType, nullable = false),
    StructField("n_replacement", LongType, nullable = false)))

  /** Column form. */
  def apply(payload: Column): Column =
    GraftBridge.column(Utf8Stats(GraftBridge.expression(payload)))

  /** Codegen entry point. */
  def parseRow(b: Array[Byte]): InternalRow = {
    if (b == null) return null
    val n = b.length
    var i = 0
    var chars = 0L
    var invalid = 0L
    var repl = 0L
    while (i < n) {
      val b0 = b(i) & 0xff
      if (b0 < 0x80) { chars += 1; i += 1 }
      else if (b0 >= 0xC2 && b0 <= 0xDF) {
        if (i + 1 < n && (b(i + 1) & 0xc0) == 0x80) { chars += 1; i += 2 }
        else { invalid += 1; i += 1 }
      } else if (b0 >= 0xE0 && b0 <= 0xEF) {
        val lo = if (b0 == 0xE0) 0xA0 else 0x80
        val hi = if (b0 == 0xED) 0x9F else 0xBF
        val ok = i + 2 < n && {
          val b1 = b(i + 1) & 0xff
          b1 >= lo && b1 <= hi && (b(i + 2) & 0xc0) == 0x80
        }
        if (ok) {
          if (b0 == 0xEF && (b(i + 1) & 0xff) == 0xBF &&
            (b(i + 2) & 0xff) == 0xBD) repl += 1
          chars += 1; i += 3
        } else { invalid += 1; i += 1 }
      } else if (b0 >= 0xF0 && b0 <= 0xF4) {
        val lo = if (b0 == 0xF0) 0x90 else 0x80
        val hi = if (b0 == 0xF4) 0x8F else 0xBF
        val ok = i + 3 < n && {
          val b1 = b(i + 1) & 0xff
          b1 >= lo && b1 <= hi && (b(i + 2) & 0xc0) == 0x80 &&
            (b(i + 3) & 0xc0) == 0x80
        }
        if (ok) { chars += 1; i += 4 }
        else { invalid += 1; i += 1 }
      } else { invalid += 1; i += 1 } // 0x80–0xC1 orphans/overlongs, 0xF5+
    }
    InternalRow(n.toLong, chars, invalid, repl)
  }
}
