package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native fused quantize-and-dot for embedding similarity: for float/double
  * arrays a, b returns `Σ floor(a_i·S)·floor(b_i·S)` as a Long (S =
  * [[graft.llm.Similarity.QuantScale]]) — exactly the portable
  * integer-quantized score the DuckDB oracle replays, in one codegen'd
  * primitive loop.
  *
  * Replaces the `aggregate(zip_with(quantize(a), quantize(b), …))` chain,
  * which (a) is interpreted — higher-order functions don't join whole-stage
  * codegen and box every element, and (b) needs the quantized Long arrays
  * materialized and carried through the pair-join shuffle (8 B/element vs
  * the raw float's 4 B). This expression keeps the raw vectors and does
  * multiply-floor-accumulate in registers; the per-pair cost is the
  * similarity operators' hot loop (every candidate pair in knn / LSH-ANN /
  * cosine-dedup evaluates it once).
  *
  * Null semantics mirror the HOF chain it replaces: mismatched lengths or a
  * null element yield NULL (zip_with pads with null, null propagates through
  * the sum).
  */
case class QuantizedDot(left: Expression, right: Expression) extends BinaryExpression {

  private def elemOk(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"quantized_dot requires array<float>/array<double> arguments, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "quantized_dot"

  private def isDoubleArr(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == DoubleType

  override protected def nullSafeEval(a: Any, b: Any): Any =
    QuantizedDot.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      isDoubleArr(left), isDoubleArr(right))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ld = isDoubleArr(left); val rd = isDoubleArr(right)
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val res = ctx.freshName("qdot")
      s"""
         |java.lang.Long $res = graft.functions.QuantizedDot.dotBoxed($a, $b, $ld, $rd);
         |if ($res == null) { ${ev.isNull} = true; } else { ${ev.value} = $res.longValue(); }
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): QuantizedDot =
    copy(left = l, right = r)
}

object QuantizedDot {
  private val Scale: Double = graft.llm.Similarity.QuantScale.toDouble

  /** Null-tracking core: null on length mismatch or any null element. */
  def dotBoxed(a: ArrayData, b: ArrayData, aDouble: Boolean, bDouble: Boolean): java.lang.Long = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aDouble) a.getDouble(i) else a.getFloat(i).toDouble
      val y = if (bDouble) b.getDouble(i) else b.getFloat(i).toDouble
      s += math.floor(x * Scale).toLong * math.floor(y * Scale).toLong
      i += 1
    }
    s
  }

  def dot(a: ArrayData, b: ArrayData, aDouble: Boolean, bDouble: Boolean): Any =
    dotBoxed(a, b, aDouble, bDouble)

  /** Column form over RAW (unquantized) vectors. */
  def apply(a: Column, b: Column): Column =
    GraftBridge.column(QuantizedDot(GraftBridge.expression(a), GraftBridge.expression(b)))
}
