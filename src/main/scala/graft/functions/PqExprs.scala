package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native PQ encoding: per subspace s, the index of the nearest codebook
  * centroid (squared L2 over the subvector) — m int codes per vector in
  * one codegen'd pass. Replaces the per-row ScalaUDF the encoder used
  * before: encoding touches EVERY corpus row (it IS the compression pass),
  * and a UDF boxes each vector into `Seq[Float]` and breaks whole-stage
  * codegen exactly where the work is. The codebook (m × ksub × subDim
  * doubles, KBs) rides as a plan reference object like
  * [[NearestCentroid]]'s centroid matrix.
  *
  * Loop order matches the original UDF exactly (subspace → centroid →
  * element, strict-< argmin keeping the first minimum), so codes are
  * bit-stable across engines and replayable by the DuckDB oracle.
  */
case class PqEncode(child: Expression, codebooks: Array[Array[Array[Double]]])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_encode requires an array<float>/array<double> argument, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "pq_encode"

  private def isDoubleArr: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == DoubleType

  override protected def nullSafeEval(v: Any): Any =
    PqEncode.encodeBoxed(v.asInstanceOf[ArrayData], codebooks, isDoubleArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbs = ctx.addReferenceObj("codebooks", codebooks, "double[][][]")
    val dbl = isDoubleArr
    nullSafeCodeGen(ctx, ev, v => {
      val res = ctx.freshName("pqCodes")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $res =
         |  graft.functions.PqEncode.encodeBoxed($v, $cbs, $dbl);
         |if ($res == null) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

object PqEncode {

  /** Null-tracking core: null on any null element, a vector whose length
    * doesn't match the codebook's m × subDim, or a ragged codebook (any
    * centroid off the uniform subDim) — encoding against a phantom zero-
    * padded tail or reading past the vector would produce plausible-
    * looking but meaningless codes. Oracles must filter mismatched rows
    * the same way (see ProductQuantizer.adcOracle's length guard).
    */
  def encodeBoxed(v: ArrayData, cbs: Array[Array[Array[Double]]],
                  isDouble: Boolean): ArrayData = {
    val n = v.numElements()
    val m = cbs.length
    if (m == 0 || cbs(0).length == 0 || n != m * cbs(0)(0).length) return null
    val subDim = cbs(0)(0).length
    var p = 0
    while (p < n) { if (v.isNullAt(p)) return null; p += 1 }
    val codes = new Array[Int](m)
    var s = 0
    while (s < m) {
      val cents = cbs(s)
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < cents.length) {
        val cent = cents(c)
        if (cent.length != subDim) return null
        var d = 0.0
        var j = 0
        while (j < cent.length) {
          val x = if (isDouble) v.getDouble(s * cent.length + j)
                  else v.getFloat(s * cent.length + j).toDouble
          val t = x - cent(j)
          d += t * t
          j += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      codes(s) = best
      s += 1
    }
    new GenericArrayData(codes)
  }

  /** Column form. */
  def apply(vec: Column, codebooks: Array[Array[Array[Double]]]): Column =
    GraftBridge.column(PqEncode(GraftBridge.expression(vec), codebooks))
}

/** Native ADC distance: given a query id and a corpus code array, sums the
  * per-subspace precomputed distance-table entries `t[s][codes[s]]` — the
  * PQ pair-scoring hot loop (every (query, corpus-code) pair in the search
  * evaluates it once), previously a ScalaUDF. Tables (per-query m × ksub
  * doubles, KBs for a contractually small query set) ride as a plan
  * reference object. Accumulation order is s ascending, matching both the
  * driver-side table build and the oracle's unrolled left-associative sum.
  */
case class AdcDist(left: Expression, right: Expression,
                   tables: java.util.HashMap[java.lang.Long, Array[Array[Double]]])
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (LongType, ArrayType(IntegerType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"adc_dist requires (bigint, array<int>), got ${l.catalogString}, ${r.catalogString}")
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "adc_dist"

  override protected def nullSafeEval(qid: Any, codes: Any): Any =
    AdcDist.distBoxed(qid.asInstanceOf[Long], codes.asInstanceOf[ArrayData], tables)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tbl = ctx.addReferenceObj("adcTables", tables, "java.util.HashMap")
    nullSafeCodeGen(ctx, ev, (q, c) => {
      val res = ctx.freshName("adc")
      s"""
         |java.lang.Double $res = graft.functions.AdcDist.distBoxed($q, $c, $tbl);
         |if ($res == null) { ${ev.isNull} = true; } else { ${ev.value} = $res.doubleValue(); }
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): AdcDist =
    copy(left = l, right = r)
}

object AdcDist {

  /** Null-tracking core: null for an unknown query id, a null code element,
    * a code outside the table's centroid range, or a codes array whose
    * length differs from the table's m — summing a shared prefix would
    * rank a corrupt row artificially near every query instead of failing.
    */
  def distBoxed(qid: Long, codes: ArrayData,
                tables: java.util.HashMap[java.lang.Long, Array[Array[Double]]]): java.lang.Double = {
    val t = tables.get(qid)
    if (t == null) return null
    val m = t.length
    if (codes.numElements() != m) return null
    var d = 0.0
    var s = 0
    while (s < m) {
      if (codes.isNullAt(s)) return null
      val c = codes.getInt(s)
      if (c < 0 || c >= t(s).length) return null
      d += t(s)(c)
      s += 1
    }
    d
  }

  /** Column form. */
  def apply(qid: Column, codes: Column,
            tables: Map[Long, Array[Array[Double]]]): Column = {
    val jm = new java.util.HashMap[java.lang.Long, Array[Array[Double]]]()
    tables.foreach { case (k, v) => jm.put(k, v) }
    GraftBridge.column(AdcDist(GraftBridge.expression(qid), GraftBridge.expression(codes), jm))
  }
}
