package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Overdispersion audit (Fano factor / index of dispersion) — is this
  * count series Poisson-like, or burstier? The assumption check run
  * BEFORE anything that trusts Poisson noise (alert thresholds sized to
  * √mean, A/B power calcs on count metrics, rate-limit capacity): for
  * a Poisson process Var = Mean (D = 1); real traffic is usually
  * overdispersed (D > 1 — bursts, daily mixtures, contagion), and a
  * threshold sized to √mean then pages constantly.
  *
  * D = s²/x̄ publishes as the exact integer fraction
  *   var_num = n·Σx² − (Σx)²,  den = (n−1)·Σx
  * (numerator/denominator as canonical DECIMAL strings — products
  * outgrow Long on big groups, the GroupedTrend convention), plus the
  * one declared truncating division fano_q6 and the EXACT
  * cross-multiplied verdict `overdispersed` = var_num > den (never a
  * float compare at the boundary). Counts must be non-negative —
  * a negative "count" raises in-plan; NULL values drop; degenerate
  * groups (n < 2 or all-zero) publish NULL fano and NULL verdict.
  *
  * One partial-agg'd moment pass per group — three sums, no window,
  * no join (the Autocorr moment posture).
  */
object Dispersion {

  val Scale = 1000000L

  /** (groupCol, n, sum, var_num, den, fano_q6, overdispersed). */
  def fano(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    graft.Guards.requireIntegral(df, valueCol, "fano")
    val dec = "decimal(38,0)"
    val x = when(col(valueCol).cast("long") < 0L,
        raise_error(concat(lit("fano: negative count "),
          col(valueCol).cast("string"),
          lit(" — the dispersion audit is for count series")))
          .cast("long"))
      .otherwise(col(valueCol).cast("long"))
    val agg = df.where(col(valueCol).isNotNull)
      .select(col(groupCol), x.as("__x"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"), sum(col("__x")).as("sum"),
        sum(col("__x").cast(dec) * col("__x").cast(dec)).cast(dec).as("__ss"))
    val n = col("n").cast(dec)
    val varNum = n * col("__ss") - col("sum").cast(dec) * col("sum").cast(dec)
    val den = (n - lit(1).cast(dec)) * col("sum").cast(dec)
    val defined = col("n") >= 2L && col("sum") > 0L
    agg.select(col(groupCol), col("n"), col("sum"),
      varNum.cast("string").as("var_num"),
      den.cast("string").as("den"),
      when(defined,
        call_function("div", varNum * lit(Scale).cast(dec), den.cast(dec)))
        .as("fano_q6"),
      when(defined, varNum > den).as("overdispersed"))
  }

  /** DuckDB replay; `rowsSql` yields (grp, x). */
  def oracleSql(rowsSql: String, groupName: String): String =
    s"""WITH a AS (SELECT grp, CAST(count(*) AS HUGEINT) AS n,
    CAST(sum(x) AS HUGEINT) AS s,
    sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS ss
  FROM ($rowsSql) WHERE x IS NOT NULL GROUP BY grp)
SELECT grp AS $groupName, CAST(n AS BIGINT) AS n, CAST(s AS BIGINT) AS sum,
  CAST(n * ss - s * s AS VARCHAR) AS var_num,
  CAST((n - 1) * s AS VARCHAR) AS den,
  CASE WHEN n >= 2 AND s > 0
       THEN CAST((n * ss - s * s) * $Scale // ((n - 1) * s) AS BIGINT)
  END AS fano_q6,
  CASE WHEN n >= 2 AND s > 0 THEN n * ss - s * s > (n - 1) * s
  END AS overdispersed
FROM a ORDER BY grp"""
}
