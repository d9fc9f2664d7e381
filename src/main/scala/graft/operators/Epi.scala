package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stratified 2×2 association — odds ratio and relative risk per
  * stratum, plus the Mantel–Haenszel pooled odds ratio: the
  * epidemiology/AB readout for "exposure vs outcome, adjusted for a
  * confounder" (feature flag vs crash rate by platform, promo vs
  * churn by region — pooling strata naively invites Simpson's
  * reversal, which is exactly what L221's diff-in-diff and this
  * operator exist to prevent).
  *
  * Per stratum the table is (a, b, c, d) = (exposed∩outcome,
  * exposed∩no, unexposed∩outcome, unexposed∩no), and both effect
  * sizes publish as EXACT integer fractions — or = a·d / b·c,
  * rr = a·(c+d) / c·(a+b) — numerator and denominator separately
  * (the reader divides; a float ratio never hash-gates). Zero cells
  * make the ratios degenerate: published as-is with a `zero_cell`
  * flag (a silently-applied Haldane correction would change the
  * estimand; the flag tells the reader to decide).
  *
  * The MH pooled estimator ÔR_MH = Σᵢ aᵢdᵢ/nᵢ ÷ Σᵢ bᵢcᵢ/nᵢ publishes
  * its two sums per-term-floored at q6 (⌊10⁶·ad/n⌋ summed — the
  * L306/L308 per-term-floor device: floors sum exactly, so the gate
  * hashes), products in DECIMAL(38,0).
  *
  * Exposure/outcome must be STRICT 0/1 columns (the BestSplit label
  * contract — anything else raises in-plan); NULL exposure/outcome
  * rows drop; NULL strata are real. One partial-agg'd conditional
  * count per stratum — scan-stage everything else.
  */
object Epi {

  val Scale = 1000000L

  private def zeroOne(c: String, fn: String) =
    when(col(c).cast("long").isin(0L, 1L), col(c).cast("long"))
      .otherwise(raise_error(concat(
        lit(s"$fn: $c must be 0/1, got "), col(c).cast("string"))))

  private def cells(df: DataFrame, strataCol: String, exposedCol: String,
                    outcomeCol: String, fn: String): DataFrame = {
    graft.Guards.requireIntegral(df, exposedCol, fn)
    graft.Guards.requireIntegral(df, outcomeCol, fn)
    df.where(col(exposedCol).isNotNull && col(outcomeCol).isNotNull)
      .select(col(strataCol), zeroOne(exposedCol, fn).as("__e"),
        zeroOne(outcomeCol, fn).as("__o"))
      .groupBy(col(strataCol))
      .agg(
        sum(when(col("__e") === 1L && col("__o") === 1L, 1L).otherwise(0L)).as("a"),
        sum(when(col("__e") === 1L && col("__o") === 0L, 1L).otherwise(0L)).as("b"),
        sum(when(col("__e") === 0L && col("__o") === 1L, 1L).otherwise(0L)).as("c"),
        sum(when(col("__e") === 0L && col("__o") === 0L, 1L).otherwise(0L)).as("d"))
  }

  /** Per stratum: (strataCol, a, b, c, d, or_num, or_den, rr_num,
    * rr_den, zero_cell). Products fit Long to ~3·10⁹ rows per stratum
    * (documented).
    */
  def twoByTwo(df: DataFrame, strataCol: String, exposedCol: String,
               outcomeCol: String): DataFrame =
    cells(df, strataCol, exposedCol, outcomeCol, "twoByTwo")
      .select(col(strataCol), col("a"), col("b"), col("c"), col("d"),
        (col("a") * col("d")).as("or_num"),
        (col("b") * col("c")).as("or_den"),
        (col("a") * (col("c") + col("d"))).as("rr_num"),
        (col("c") * (col("a") + col("b"))).as("rr_den"),
        (col("a") === 0L || col("b") === 0L || col("c") === 0L ||
          col("d") === 0L).as("zero_cell"))

  /** One pooled row: (n_strata, n_rows, mh_num_q6, mh_den_q6) — the
    * Mantel–Haenszel sums, each term ⌊10⁶·ad/n⌋ / ⌊10⁶·bc/n⌋.
    */
  def mantelHaenszel(df: DataFrame, strataCol: String, exposedCol: String,
                     outcomeCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    val n = (col("a") + col("b") + col("c") + col("d")).cast(dec)
    cells(df, strataCol, exposedCol, outcomeCol, "mantelHaenszel")
      .select(
        call_function("div",
          col("a").cast(dec) * col("d").cast(dec) * lit(Scale).cast(dec), n)
          .as("__adn"),
        call_function("div",
          col("b").cast(dec) * col("c").cast(dec) * lit(Scale).cast(dec), n)
          .as("__bcn"),
        (col("a") + col("b") + col("c") + col("d")).as("__n"))
      .agg(count(lit(1)).as("n_strata"), sum(col("__n")).as("n_rows"),
        sum(col("__adn")).as("mh_num_q6"), sum(col("__bcn")).as("mh_den_q6"))
  }

  /** DuckDB replay of [[twoByTwo]]; `rowsSql` yields (grp, e, o). */
  def twoByTwoOracle(rowsSql: String, strataName: String): String =
    s"""WITH t AS (SELECT grp,
    CAST(count(*) FILTER (WHERE e = 1 AND o = 1) AS BIGINT) AS a,
    CAST(count(*) FILTER (WHERE e = 1 AND o = 0) AS BIGINT) AS b,
    CAST(count(*) FILTER (WHERE e = 0 AND o = 1) AS BIGINT) AS c,
    CAST(count(*) FILTER (WHERE e = 0 AND o = 0) AS BIGINT) AS d
  FROM ($rowsSql) WHERE e IS NOT NULL AND o IS NOT NULL GROUP BY grp)
SELECT grp AS $strataName, a, b, c, d,
  a * d AS or_num, b * c AS or_den,
  a * (c + d) AS rr_num, c * (a + b) AS rr_den,
  (a = 0 OR b = 0 OR c = 0 OR d = 0) AS zero_cell
FROM t ORDER BY grp"""

  /** DuckDB replay of [[mantelHaenszel]]. */
  def mantelHaenszelOracle(rowsSql: String): String =
    s"""WITH t AS (SELECT grp,
    CAST(count(*) FILTER (WHERE e = 1 AND o = 1) AS HUGEINT) AS a,
    CAST(count(*) FILTER (WHERE e = 1 AND o = 0) AS HUGEINT) AS b,
    CAST(count(*) FILTER (WHERE e = 0 AND o = 1) AS HUGEINT) AS c,
    CAST(count(*) FILTER (WHERE e = 0 AND o = 0) AS HUGEINT) AS d
  FROM ($rowsSql) WHERE e IS NOT NULL AND o IS NOT NULL GROUP BY grp)
SELECT CAST(count(*) AS BIGINT) AS n_strata,
  CAST(sum(a + b + c + d) AS BIGINT) AS n_rows,
  CAST(sum((a * d * $Scale) // (a + b + c + d)) AS BIGINT) AS mh_num_q6,
  CAST(sum((b * c * $Scale) // (a + b + c + d)) AS BIGINT) AS mh_den_q6
FROM t"""
}
