package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact higher central moments — distribution SHAPE for the profiling
  * family ([[Profiling.profile]] reads location/spread; this reads
  * asymmetry and tail weight): skewness's sign says which tail is long
  * (revenue is right-skewed, latency regressions show up as a growing
  * right tail long before the mean moves), kurtosis says whether
  * outliers are the rule. The standardized float moments never
  * hash-gate (they carry √ and ³⁄₂-powers), so this publishes the
  * EXACT central-moment numerators from one pass of raw power sums:
  *
  *   m2_num = n·S2 − S1²                                  (over n²)
  *   m3_num = n²·S3 − 3n·S1·S2 + 2·S1³                    (over n³)
  *   m4_num = n³·S4 − 4n²·S1·S3 + 6n·S1²·S2 − 3·S1⁴       (over n⁴)
  *
  * as canonical DECIMAL strings, plus two EXACT verdicts: `skew_sign`
  * (the sign of m3 — cross-multiplication-free, the decision-grade
  * bit) and `heavy_tails` = m4_num > 3·m2_num² (the n⁴ scale factors
  * cancel exactly between m4 and m2²); excess kurtosis > 0, NULL when
  * n < 2. Magnitude contract: m4 ≈ kurt·m2², so the numerators and the
  * compare overflow TOGETHER — past DECIMAL(38,0) (≈ n·|x|⁴·n³ digits)
  * ANSI throws LOUDLY rather than silently rescaling (the ChangePoint
  * convention: pre-scale units down; |x| ≤ ~3·10³ at n ≤ 10⁶ is safe).
  * One partial-agg'd four-sum moment pass per group; NULL values drop;
  * NULL groups real.
  */
object HigherMoments {

  private val Dec = "decimal(38,0)"

  /** (groupCol, n, m2_num, m3_num, m4_num, skew_sign, heavy_tails). */
  def shape(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    graft.Guards.requireIntegral(df, valueCol, "higherMoments")
    val x = col("__x").cast(Dec)
    val agg = df.where(col(valueCol).isNotNull)
      .select(col(groupCol), col(valueCol).cast("long").as("__x"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        sum(x).cast(Dec).as("__s1"),
        sum(x * x).cast(Dec).as("__s2"),
        sum(x * x * x).cast(Dec).as("__s3"),
        sum(x * x * x * x).cast(Dec).as("__s4"))
    val n = col("n").cast(Dec)
    val s1 = col("__s1"); val s2 = col("__s2")
    val s3 = col("__s3"); val s4 = col("__s4")
    val m2 = n * s2 - s1 * s1
    val m3 = n * n * s3 - lit(3).cast(Dec) * n * s1 * s2 +
      lit(2).cast(Dec) * s1 * s1 * s1
    val m4 = n * n * n * s4 - lit(4).cast(Dec) * n * n * s1 * s3 +
      lit(6).cast(Dec) * n * s1 * s1 * s2 -
      lit(3).cast(Dec) * s1 * s1 * s1 * s1
    agg.select(col(groupCol), col("n"),
      m2.cast("string").as("m2_num"),
      m3.cast("string").as("m3_num"),
      m4.cast("string").as("m4_num"),
      when(col("n") >= 2L, signum(m3).cast("long")).as("skew_sign"),
      when(col("n") >= 2L,
        m4 > lit(3).cast(Dec) * m2 * m2).as("heavy_tails"))
  }

  /** DuckDB replay; `rowsSql` yields (grp, x). */
  def oracleSql(rowsSql: String, groupName: String): String =
    s"""WITH a AS (SELECT grp, CAST(count(*) AS HUGEINT) AS n,
    CAST(sum(x) AS HUGEINT) AS s1,
    sum(CAST(x AS HUGEINT) * x) AS s2,
    sum(CAST(x AS HUGEINT) * x * x) AS s3,
    sum(CAST(x AS HUGEINT) * x * x * x) AS s4
  FROM ($rowsSql) WHERE x IS NOT NULL GROUP BY grp),
m AS (SELECT grp, n,
    n * s2 - s1 * s1 AS m2,
    n * n * s3 - 3 * n * s1 * s2 + 2 * s1 * s1 * s1 AS m3,
    n * n * n * s4 - 4 * n * n * s1 * s3 + 6 * n * s1 * s1 * s2
      - 3 * s1 * s1 * s1 * s1 AS m4
  FROM a)
SELECT grp AS $groupName, CAST(n AS BIGINT) AS n,
  CAST(m2 AS VARCHAR) AS m2_num, CAST(m3 AS VARCHAR) AS m3_num,
  CAST(m4 AS VARCHAR) AS m4_num,
  CASE WHEN n >= 2 THEN CAST(sign(m3) AS BIGINT) END AS skew_sign,
  CASE WHEN n >= 2 THEN m4 > 3 * m2 * m2 END AS heavy_tails
FROM m ORDER BY grp"""
}
