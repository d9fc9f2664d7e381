package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** STRICT inversion count over one group's collected series — the number
  * of index pairs i < j with a(i) > a(j), the quadratic pair statistic
  * behind Mann–Kendall's S (discordant pairs) computed in O(n log n) by
  * merge-sort counting, because the naive pair join is n(n−1)/2 rows of
  * shuffle for a number three aggregates already determine. Equal
  * neighbors are NOT inversions (ties are counted separately from
  * per-value marginals by the caller). Same native-over-collected-array
  * posture as [[IsotonicPav]] / [[KllOps]]: one static call per group,
  * inside codegen.
  *
  * Input: `array<bigint>` in series order (the caller sorts by the time
  * index and guards size/duplicates). A null ELEMENT violates the
  * caller's filter contract and throws loudly — never a silent 0 vote.
  * A null array yields null. The count itself is bounded by n(n−1)/2,
  * far inside Long at any guarded size.
  */
case class InversionCount(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"inversion_count requires array<bigint>, got ${dt.catalogString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "inversion_count"

  override protected def nullSafeEval(input: Any): Any =
    InversionCount.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.InversionCount.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): InversionCount =
    copy(child = newChild)
}

object InversionCount {

  def compute(arr: ArrayData): Long = {
    val n = arr.numElements()
    val a = new Array[Long](n)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i))
        throw new IllegalArgumentException(
          "inversion_count: null element — filter nulls before collecting")
      a(i) = arr.getLong(i)
      i += 1
    }
    if (n < 2) 0L else {
      val buf = new Array[Long](n)
      countSort(a, buf, 0, n)
    }
  }

  /** Merge sort of a[lo, hi), returning the strict inversion count. */
  private def countSort(a: Array[Long], buf: Array[Long], lo: Int, hi: Int): Long = {
    if (hi - lo < 2) return 0L
    val mid = (lo + hi) >>> 1
    var inv = countSort(a, buf, lo, mid) + countSort(a, buf, mid, hi)
    var l = lo; var r = mid; var o = lo
    while (l < mid && r < hi) {
      // stability on equals: take LEFT first, so equal pairs never count
      if (a(l) <= a(r)) { buf(o) = a(l); l += 1 }
      else { buf(o) = a(r); r += 1; inv += (mid - l) } // a(l..mid) all > a(r)
      o += 1
    }
    while (l < mid) { buf(o) = a(l); l += 1; o += 1 }
    while (r < hi) { buf(o) = a(r); r += 1; o += 1 }
    System.arraycopy(buf, lo, a, lo, hi - lo)
    inv
  }

  def apply(values: Column): Column =
    GraftBridge.column(InversionCount(GraftBridge.expression(values)))
}
