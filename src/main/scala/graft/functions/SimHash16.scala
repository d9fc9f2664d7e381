package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native 16-bit SimHash over a shingle-string array: per shingle, hash to
  * `md5prefix60 % M`, vote ±1 on each of the 16 low bits, set output bit b
  * when its vote sum is positive. Semantically identical to the HOF
  * formulation in [[graft.llm.Dedup.simhash]]'s history (16 `when` exprs +
  * `zip_with` accumulator per shingle, all interpreted) and to the DuckDB
  * oracle's CASE-sum replay — this runs the whole vote table in one Java
  * loop per document, inside whole-stage codegen.
  *
  * Null semantics mirror the HOF chain: a null array yields null; a null
  * element's bit-test condition is null, which `when(...).otherwise(-1)`
  * turns into a −1 vote on every bit.
  */
case class SimHash16(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"simhash16 requires array<string>, got ${dt.catalogString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash16"

  override protected def nullSafeEval(input: Any): Any =
    SimHash16.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash16.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash16 =
    copy(child = newChild)
}

object SimHash16 {
  val Bits = 16
  /** Same modulus as [[graft.text.TextFunctions.M]] (shared hash space) —
    * aliased, not re-declared, so the two can never drift.
    */
  val M: Long = graft.text.TextFunctions.M

  def compute(shingles: ArrayData): Long = {
    val votes = new Array[Int](Bits)
    val n = shingles.numElements()
    var i = 0
    while (i < n) {
      if (shingles.isNullAt(i)) {
        var b = 0
        while (b < Bits) { votes(b) -= 1; b += 1 } // null elem: -1 on every bit
      } else {
        val hv = Md5Prefix60.hash60(shingles.getUTF8String(i)) % M
        var b = 0
        while (b < Bits) {
          votes(b) += (if (((hv >>> b) & 1L) == 1L) 1 else -1)
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < Bits) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  def apply(shingleArr: Column): Column =
    GraftBridge.column(SimHash16(GraftBridge.expression(shingleArr)))
}
