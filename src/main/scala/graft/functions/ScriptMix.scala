package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, GenericInternalRow}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode script-mix histogram — which writing systems a text field
  * actually contains, counted per codepoint in one pass: the corpus
  * triage BEFORE language ID (a "German" document that is 40% Cyrillic
  * is mislabeled or spam), mixed-script spoofing detection (Latin/
  * Cyrillic homoglyph stuffing), and tokenizer-budget planning (CJK
  * characters cost different token rates than Latin). The companion to
  * [[Utf8Stats]] — that one judges byte VALIDITY, this one judges
  * character POPULATION.
  *
  * Classification is a DECLARED fixed range table (documented here, not
  * Unicode-version-chasing): ASCII splits into letter/digit/whitespace/
  * punct; 0x80–0x2FF Latin supplement+extended+IPA; 0x400–0x52F
  * Cyrillic; 0x600–0x6FF and 0x750–0x77F Arabic; CJK = unified
  * ideographs (0x3400–0x4DBF, 0x4E00–0x9FFF, 0xF900–0xFAFF) plus kana
  * (0x3040–0x30FF); Hangul = jamo 0x1100–0x11FF plus syllables
  * 0xAC00–0xD7AF; everything else `other`. One doGenCode static call,
  * O(n), never throws.
  */
case class ScriptMix(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"script_mix requires a string column, got ${dt.catalogString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n_cp", LongType, nullable = false),
    StructField("ascii_letter", LongType, nullable = false),
    StructField("digit", LongType, nullable = false),
    StructField("whitespace", LongType, nullable = false),
    StructField("punct", LongType, nullable = false),
    StructField("latin_ext", LongType, nullable = false),
    StructField("cyrillic", LongType, nullable = false),
    StructField("arabic", LongType, nullable = false),
    StructField("cjk", LongType, nullable = false),
    StructField("hangul", LongType, nullable = false),
    StructField("other", LongType, nullable = false)))

  override def prettyName: String = "script_mix"

  override protected def nullSafeEval(input: Any): Any =
    ScriptMix.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ScriptMix.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): ScriptMix =
    copy(child = newChild)
}

object ScriptMix {

  def compute(u: UTF8String): GenericInternalRow = {
    val s = u.toString
    var nCp, letter, digit, ws, punct, latin, cyr, ar, cjk, hang, other = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      i += Character.charCount(cp)
      nCp += 1
      if (cp < 0x80) {
        if ((cp >= 'a' && cp <= 'z') || (cp >= 'A' && cp <= 'Z')) letter += 1
        else if (cp >= '0' && cp <= '9') digit += 1
        else if (cp == ' ' || cp == '\t' || cp == '\n' || cp == '\r') ws += 1
        else punct += 1
      } else if (cp <= 0x2FF) latin += 1
      else if (cp >= 0x400 && cp <= 0x52F) cyr += 1
      else if ((cp >= 0x600 && cp <= 0x6FF) || (cp >= 0x750 && cp <= 0x77F)) ar += 1
      else if ((cp >= 0x3400 && cp <= 0x4DBF) || (cp >= 0x4E00 && cp <= 0x9FFF) ||
        (cp >= 0xF900 && cp <= 0xFAFF) || (cp >= 0x3040 && cp <= 0x30FF)) cjk += 1
      else if ((cp >= 0x1100 && cp <= 0x11FF) || (cp >= 0xAC00 && cp <= 0xD7AF)) hang += 1
      else other += 1
    }
    new GenericInternalRow(Array[Any](
      nCp, letter, digit, ws, punct, latin, cyr, ar, cjk, hang, other))
  }

  def apply(text: Column): Column =
    GraftBridge.column(ScriptMix(GraftBridge.expression(text)))
}
