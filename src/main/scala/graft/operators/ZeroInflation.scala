package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Zero-inflation audit — are there MORE empty periods than the rate
  * explains? The third member of the count-series audit trio
  * ([[Dispersion]] reads variance, [[Beaconing]] reads regularity;
  * this reads the zeros): a Poisson process at the observed mean λ
  * produces e^{−λ} empty periods; real demand/usage data routinely
  * carries structural zeros on top (dormant accounts, delisted SKUs,
  * dark deploy windows), and a model fit without acknowledging them
  * under-forecasts everything — the classical precondition check for
  * [[Croston]] (intermittent ≈ zero-inflated) and hurdle models.
  *
  * Exact semantics: counts (n, n_zeros, sum) are exact; the expected
  * zero count ⌊n·e^{−sum/n}⌋ is ONE declared double chain (one
  * division, one exp, one multiply, one floor — both engines evaluate
  * the identical chain, the columnEntropy ln discipline's exp twin);
  * the verdict `zero_inflated` = n_zeros > expected is then an exact
  * integer compare. The published `excess_zeros` = n_zeros − expected
  * sizes the structural-zero mass for the hurdle model's gate.
  * Negative counts raise in-plan (the [[Dispersion]] contract);
  * NULL values drop; NULL groups are real strata.
  *
  * One partial-agg'd three-sum pass per group — no window, no join.
  */
object ZeroInflation {

  /** (groupCol, n, n_zeros, sum, expected_zeros, excess_zeros,
    * zero_inflated).
    */
  def audit(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    graft.Guards.requireIntegral(df, valueCol, "zeroInflation")
    val x = when(col(valueCol).cast("long") < 0L,
        raise_error(concat(lit("zeroInflation: negative count "),
          col(valueCol).cast("string"),
          lit(" — the audit is for count series"))).cast("long"))
      .otherwise(col(valueCol).cast("long"))
    val agg = df.where(col(valueCol).isNotNull)
      .select(col(groupCol), x.as("__x"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        sum(when(col("__x") === 0L, 1L).otherwise(0L)).as("n_zeros"),
        sum(col("__x")).as("sum"))
    // the one declared double chain: n·exp(−mean), floored
    val expected = floor(col("n").cast("double") *
      exp(-(col("sum").cast("double") / col("n").cast("double"))))
      .cast("long")
    agg.select(col(groupCol), col("n"), col("n_zeros"), col("sum"),
      expected.as("expected_zeros"),
      (col("n_zeros") - expected).as("excess_zeros"),
      (col("n_zeros") > expected).as("zero_inflated"))
  }

  /** DuckDB replay — the identical chain; `rowsSql` yields (grp, x). */
  def oracleSql(rowsSql: String, groupName: String): String =
    s"""WITH a AS (SELECT grp, CAST(count(*) AS BIGINT) AS n,
    CAST(count(*) FILTER (WHERE x = 0) AS BIGINT) AS n_zeros,
    CAST(sum(x) AS BIGINT) AS s
  FROM ($rowsSql) WHERE x IS NOT NULL GROUP BY grp)
SELECT grp AS $groupName, n, n_zeros, s AS sum,
  CAST(floor(CAST(n AS DOUBLE)
    * exp(-(CAST(s AS DOUBLE) / CAST(n AS DOUBLE)))) AS BIGINT)
    AS expected_zeros,
  n_zeros - CAST(floor(CAST(n AS DOUBLE)
    * exp(-(CAST(s AS DOUBLE) / CAST(n AS DOUBLE)))) AS BIGINT)
    AS excess_zeros,
  n_zeros > CAST(floor(CAST(n AS DOUBLE)
    * exp(-(CAST(s AS DOUBLE) / CAST(n AS DOUBLE)))) AS BIGINT)
    AS zero_inflated
FROM a ORDER BY grp"""
}
