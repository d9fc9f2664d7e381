package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Exact Σ of a LONG column as decimal(38,0) — without paying the
  * decimal(38) aggregation tax.
  *
  * `sum(col.cast("decimal(38,0)"))` is exact but slow at scale: a
  * decimal with precision > 18 is stored in the aggregation buffer as
  * BigInteger bytes, so EVERY per-row update deserializes the buffer,
  * adds on java.math.BigDecimal, and re-serializes (~10× the cost of a
  * primitive add, plus allocation). This helper computes the identical
  * value from three codegen'd LONG sums via 21-bit limb decomposition:
  *
  *   c = (c >> 42)·2⁴² + ((c >> 21) & M)·2²¹ + (c & M),  M = 2²¹ − 1
  *
  * which is an identity for every signed long (arithmetic shift =
  * floor division). Each limb sum accumulates in a primitive long slot
  * inside whole-stage codegen; the three totals are recombined in
  * decimal(38,0) once per GROUP, not per row. Partial aggregates ship
  * as 8-byte longs instead of 16-byte decimals, halving the aggregate
  * exchange bytes too.
  *
  * Overflow envelope: |hi limb| ≤ 2²¹ and mid/lo ∈ [0, 2²¹), so a limb
  * sum stays inside a long for ~2⁴¹ ≈ 4·10¹² rows per group — far past
  * any real group, and ANSI mode raises loudly (never wraps) if a whale
  * group ever crosses it. The recombination is decimal(38,0)
  * arithmetic, same overflow discipline as the replaced sum.
  *
  * Null semantics match `sum(decimal)` exactly: per-row NULLs are
  * skipped by all three limb sums in lockstep (shift/mask of NULL is
  * NULL), and an empty or all-NULL group yields NULL (null limb totals
  * propagate through the recombination).
  */
object ExactSum {

  private val Dec = "decimal(38,0)"
  private val LimbBits = 21
  private val Mask = (1L << LimbBits) - 1

  private def recombine(hi: Column, mid: Column, lo: Column): Column =
    hi.cast(Dec) * lit(1L << (2 * LimbBits)).cast(Dec) +
      mid.cast(Dec) * lit(1L << LimbBits).cast(Dec) +
      lo.cast(Dec)

  private def limbs(c: Column): (Column, Column, Column) =
    (sum(shiftright(c, 2 * LimbBits)),
      sum(shiftright(c, LimbBits).bitwiseAND(lit(Mask))),
      sum(c.bitwiseAND(lit(Mask))))

  /** Exact Σ`c` (a LongType column) as decimal(38,0); drop-in for
    * `sum(c.cast("decimal(38,0)"))` inside `agg(...)`. For window
    * frames use [[sumLongOver]] — `.over` on this composite would not
    * distribute onto the three inner sums.
    */
  def sumLong(c: Column): Column = {
    val (hi, mid, lo) = limbs(c)
    recombine(hi, mid, lo)
  }

  /** The window-frame form: drop-in for
    * `sum(c.cast("decimal(38,0)")).over(w)`.
    */
  def sumLongOver(c: Column,
                  w: org.apache.spark.sql.expressions.WindowSpec): Column = {
    val (hi, mid, lo) = limbs(c)
    recombine(hi.over(w), mid.over(w), lo.over(w))
  }
}
