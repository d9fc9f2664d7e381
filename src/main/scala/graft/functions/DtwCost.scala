package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Dynamic-time-warping alignment cost between two integer series — the
  * shape-similarity measure that tolerates local time shifts where
  * Euclidean distance punishes them (two identical weekly patterns
  * offset by a day are "far" pointwise, near under DTW). A NATIVE
  * expression because the DP's data-dependent min-recurrence is neither
  * a window nor an `aggregate`-HOF shape (the [[IsotonicPav]] argument);
  * one static call per pair, inside codegen, O(n·m) time and O(min(n,m))
  * memory via two rolling rows.
  *
  * Semantics: classic DTW with unit steps (match/insert/delete), cost =
  * |aᵢ − bⱼ|, exact Long arithmetic (path sums bounded by Σ|Δ| — loud
  * `addExact` overflow, never a wrap). `band > 0` applies a Sakoe–Chiba
  * band widened to at least |n−m| (narrower would make every path
  * infeasible); `band <= 0` is the full DP. Either input empty → NULL
  * (no alignment exists).
  */
case class DtwCost(left: Expression, right: Expression, band: Int)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"dtw_cost requires two array<bigint>, got ${l.catalogString}, ${r.catalogString}")
    }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "dtw_cost"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DtwCost.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], band)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("dtwRes")
      s"""
Object $r = graft.functions.DtwCost.compute($a, $b, $band);
if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = ((Long) $r).longValue(); }
"""
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): DtwCost =
    copy(left = newLeft, right = newRight)
}

object DtwCost {

  /** Null when either series is empty; otherwise the exact DP cost. */
  def compute(aArr: ArrayData, bArr: ArrayData, band: Int): Any = {
    val n = aArr.numElements()
    val m = bArr.numElements()
    if (n == 0 || m == 0) return null
    val a = new Array[Long](n)
    val b = new Array[Long](m)
    var i = 0
    while (i < n) { a(i) = aArr.getLong(i); i += 1 }
    i = 0
    while (i < m) { b(i) = bArr.getLong(i); i += 1 }
    val eb: Long =
      if (band <= 0) Long.MaxValue
      else math.max(band.toLong, math.abs(n.toLong - m.toLong))
    val Inf = Long.MaxValue / 4
    val prev = new Array[Long](m + 1)
    val cur = new Array[Long](m + 1)
    java.util.Arrays.fill(prev, Inf)
    prev(0) = 0L
    var ii = 1
    while (ii <= n) {
      java.util.Arrays.fill(cur, Inf)
      // compare before adding: ii ± eb would overflow at eb = MaxValue
      val lo = if (eb >= ii - 1L) 1 else (ii - eb).toInt
      val hi = if (eb >= m.toLong - ii) m else (ii + eb).toInt
      var j = lo
      while (j <= hi) {
        var best = prev(j)
        if (prev(j - 1) < best) best = prev(j - 1)
        if (cur(j - 1) < best) best = cur(j - 1)
        if (best < Inf) {
          val d = a(ii - 1) - b(j - 1)
          cur(j) = Math.addExact(best, if (d < 0) -d else d)
        }
        j += 1
      }
      System.arraycopy(cur, 0, prev, 0, m + 1)
      ii += 1
    }
    if (prev(m) >= Inf) null else java.lang.Long.valueOf(prev(m))
  }

  def apply(a: Column, b: Column, band: Int): Column =
    GraftBridge.column(DtwCost(
      GraftBridge.expression(a), GraftBridge.expression(b), band))
}
