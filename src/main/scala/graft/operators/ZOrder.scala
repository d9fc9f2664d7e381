package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) curve layout: interleave the bits of two dimension
  * keys so that sorting by the z-value co-locates rows close in BOTH
  * dimensions — the multi-dimensional clustering trick behind Delta/Iceberg
  * Z-ORDER. Files written in z-order give min/max-stats pruning on either
  * dimension (a plain sort prunes only its leading column).
  *
  * The z-value is pure integer bit arithmetic (shift/mask/or composed as
  * Long ops — codegen'd, engine-replayable); `layout` is one global
  * range-sort by z, i.e. the same cost as any sorted write.
  */
object ZOrder {

  /** Morton interleave of the low `bits` bits of x and y (x takes the even
    * positions). `bits` ≤ 31 keeps the result in a positive Long. Inputs
    * are masked to `bits`, so callers bucket/shift real values first.
    */
  def zValue(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits > 0 && bits <= 31, "bits must be in 1..31")
    val xs = x.cast("long"); val ys = y.cast("long")
    (0 until bits).map { i =>
      val xb = shiftleft(shiftright(xs, i) % 2, 2 * i)
      val yb = shiftleft(shiftright(ys, i) % 2, 2 * i + 1)
      (xb + yb): Column
    }.reduce(_ + _)
  }

  /** SQL form of [[zValue]] — same shift/mod arithmetic, for the oracle and
    * pushdown rendering.
    */
  def zValueSql(x: String, y: String, bits: Int = 16): String =
    (0 until bits).map { i =>
      s"((($x >> $i) % 2) << ${2 * i}) + ((($y >> $i) % 2) << ${2 * i + 1})"
    }.mkString("(", " + ", ")")

  /** Rows sorted by the z-curve over (xCol, yCol) — feed straight into a
    * partitioned/sorted write for two-dimensional stats pruning.
    */
  def layout(df: DataFrame, xCol: String, yCol: String, bits: Int = 16): DataFrame =
    df.orderBy(zValue(col(xCol), col(yCol), bits))
}
