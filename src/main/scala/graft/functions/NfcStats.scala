package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization audit: `nfc_stats(text)` →
  * `struct<is_nfc boolean, n_cp int, n_cp_nfc int>` — the text-quality
  * check that catches MIXED-NORMALIZATION corpora before they corrupt
  * everything downstream: "café" in NFC and "café" in NFD are
  * DIFFERENT strings to exact dedup (L1), different shingles to
  * MinHash/SimHash, different tokens to the vocabulary — a corpus
  * assembled from macOS filenames (NFD) and web text (NFC) silently
  * doubles its apparent vocabulary. The audit publishes the flag and
  * the codepoint counts before/after NFC (the delta IS the combining
  * marks a normalizer would compose).
  *
  * Counts are CODEPOINTS (not UTF-16 units — Spark's `length` counts
  * code units and diverges on astral chars; this expression counts
  * with `codePointCount`, matching the SQL convention DuckDB's
  * `length`/`nfc_normalize` replay). Both engines implement the same
  * Unicode NFC tables, so the audit gates bit-for-bit. NULL text is
  * NULL. One doGenCode static call, the [[AudioMeta]] posture.
  */
case class NfcStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nfc_stats requires a string argument, got ${other.catalogString}")
  }

  override def dataType: DataType = NfcStats.Schema
  override def nullable: Boolean = true
  override def prettyName: String = "nfc_stats"

  override protected def nullSafeEval(v: Any): Any =
    NfcStats.compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => s"""
      ${ev.value} = graft.functions.NfcStats.compute($v);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): NfcStats =
    copy(child = newChild)
}

object NfcStats {
  val Schema: StructType = StructType(Seq(
    StructField("is_nfc", BooleanType, nullable = false),
    StructField("n_cp", IntegerType, nullable = false),
    StructField("n_cp_nfc", IntegerType, nullable = false)))

  def apply(text: Column): Column =
    GraftBridge.column(NfcStats(GraftBridge.expression(text)))

  def compute(s: UTF8String): GenericInternalRow = {
    if (s == null) return null
    val str = s.toString
    val isNfc = Normalizer.isNormalized(str, Normalizer.Form.NFC)
    val nfc = if (isNfc) str else Normalizer.normalize(str, Normalizer.Form.NFC)
    val row = new GenericInternalRow(3)
    row.update(0, isNfc)
    row.update(1, str.codePointCount(0, str.length))
    row.update(2, nfc.codePointCount(0, nfc.length))
    row
  }
}
