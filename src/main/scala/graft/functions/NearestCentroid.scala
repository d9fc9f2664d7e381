package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native argmin-over-centroids for coarse-quantizer assignment (IVF list
  * routing): returns the index of the nearest centroid (squared L2) for a
  * float/double vector column. The centroid matrix rides along as an
  * expression reference object — it is tiny (nLists × dim doubles, a few KB)
  * and ships once per task with the serialized plan, exactly like a
  * broadcast but without a per-row ScalaUDF boundary.
  *
  * Replaces the per-row assignment UDF the index build used before: a
  * ScalaUDF deserializes every vector into a boxed `Seq[Float]` and breaks
  * whole-stage codegen for the full corpus-assignment pass — the one pass in
  * the build that touches every row. This expression reads the unsafe array
  * data in place inside generated code.
  *
  * Null semantics: a null vector, an EMPTY vector, or any null element
  * yields NULL (the list id would be meaningless — an empty vector is
  * equidistant from every centroid); mismatched non-zero dims compare over
  * the shared prefix.
  */
case class NearestCentroid(child: Expression, centroids: Array[Array[Double]])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nearest_centroid requires an array<float>/array<double> argument, got ${other.catalogString}")
  }

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "nearest_centroid"

  private def isDoubleArr: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == DoubleType

  override protected def nullSafeEval(v: Any): Any = {
    val r = NearestCentroid.nearestBoxed(v.asInstanceOf[ArrayData], centroids, isDoubleArr)
    if (r == null) null else r.intValue()
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cs = ctx.addReferenceObj("centroids", centroids, "double[][]")
    val dbl = isDoubleArr
    nullSafeCodeGen(ctx, ev, v => {
      val res = ctx.freshName("nearest")
      s"""
         |java.lang.Integer $res = graft.functions.NearestCentroid.nearestBoxed($v, $cs, $dbl);
         |if ($res == null) { ${ev.isNull} = true; } else { ${ev.value} = $res.intValue(); }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroid =
    copy(child = newChild)
}

object NearestCentroid {

  /** Null-tracking core: null on empty centroid set, empty vector, or any
    * null element.
    */
  def nearestBoxed(v: ArrayData, cs: Array[Array[Double]], isDouble: Boolean): java.lang.Integer = {
    if (cs.length == 0) return null
    val n = v.numElements()
    if (n == 0) return null
    var j = 0
    while (j < n) { if (v.isNullAt(j)) return null; j += 1 }
    var best = 0
    var bestD = Double.MaxValue
    var i = 0
    while (i < cs.length) {
      val c = cs(i)
      val m = if (n < c.length) n else c.length
      var d = 0.0
      var k = 0
      while (k < m) {
        val x = if (isDouble) v.getDouble(k) else v.getFloat(k).toDouble
        val t = x - c(k)
        d += t * t
        k += 1
      }
      if (d < bestD) { bestD = d; best = i }
      i += 1
    }
    best
  }

  /** Column form. */
  def apply(vec: Column, centroids: Array[Array[Double]]): Column =
    GraftBridge.column(NearestCentroid(GraftBridge.expression(vec), centroids))
}
