package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Wald–Wolfowitz runs test — is a sequence's SIGN PATTERN random, or
  * does it cluster/alternate? The classical randomness audit for
  * residual series (a model whose errors run in streaks is missing
  * structure), synthetic-data screening, and market up/down-day
  * analysis: too FEW runs = positive autocorrelation (streaky), too
  * MANY = negative (saw-tooth). Beside [[StateRuns]] (which measures
  * run LENGTHS descriptively) this is the TEST — it publishes the
  * observed run count against the exact null moments.
  *
  * Exact semantics: rows dichotomize against a DECLARED `threshold`
  * (values equal to it DROP — the classical tie rule); runs count via
  * one lag on the (idx)-ordered window; the null mean `1 + 2n₁n₂/n` and
  * variance `2n₁n₂(2n₁n₂−n)/(n²(n−1))` are exact rationals published as
  * single truncating q6 divisions (numerators in DECIMAL(38,0)); the
  * float z rides spec-side. Duplicate indexes raise in-plan (the run
  * pattern must be a function of the data).
  *
  * Scale shape: one per-group ordered window + one group collapse (the
  * [[Drawdown]] posture); calendar-series contract.
  */
object RunsTest {

  val Scale = 1000000L

  /** One row per group: (groupCol, n_above, n_below, runs,
    * mean_runs_q6, var_runs_q6). NULL moments when n₁ = 0 or n₂ = 0 or
    * n < 2 (the test is undefined on a one-sided sequence).
    */
  def runsTest(df: DataFrame, groupCol: String, idxCol: String,
               valueCol: String, threshold: Long): DataFrame = {
    graft.Guards.requireIntegral(df, idxCol, "runsTest")
    graft.Guards.requireIntegral(df, valueCol, "runsTest")
    val dec = "decimal(38,0)"
    val rows = df
      .where(col(idxCol).isNotNull && col(valueCol).isNotNull &&
        col(valueCol).cast("long") =!= threshold)
      .select(col(groupCol), col(idxCol).cast("long").as("__i"),
        (col(valueCol).cast("long") > threshold).as("__up"))
    val w = Window.partitionBy(col(groupCol)).orderBy(col("__i"))
    val marked = rows
      .withColumn("__dup", lag(col("__i"), 1).over(w) === col("__i"))
      .withColumn("__chg",
        when(lag(col("__up"), 1).over(w).isNull, 1L)
          .when(lag(col("__up"), 1).over(w) =!= col("__up"), 1L)
          .otherwise(0L))
    val agg = marked.groupBy(col(groupCol))
      .agg(max(coalesce(col("__dup"), lit(false))).as("__anyDup"),
        sum(when(col("__up"), 1L).otherwise(0L)).as("n_above"),
        sum(when(col("__up"), 0L).otherwise(1L)).as("n_below"),
        sum(col("__chg")).as("runs"))
    val n1 = col("n_above").cast(dec); val n2 = col("n_below").cast(dec)
    val n = (n1 + n2).cast(dec)
    val two = lit(2).cast(dec)
    val defined = col("n_above") > 0 && col("n_below") > 0 &&
      (col("n_above") + col("n_below")) >= 2
    val meanQ = call_function("div",
      (lit(Scale).cast(dec) * (n + two * n1 * n2)).cast(dec), n)
    val varQ = call_function("div",
      (lit(Scale).cast(dec) * two * n1 * n2 * (two * n1 * n2 - n)).cast(dec),
      (n * n * (n - lit(1).cast(dec))).cast(dec))
    def guarded(out: org.apache.spark.sql.Column) =
      when(col("__anyDup"), raise_error(concat(
        lit("runsTest: duplicate idx within group '"),
        col(groupCol).cast("string"),
        lit("' — the run pattern must be a function of the data")))
        .cast("long"))
        .otherwise(out)
    agg.select(col(groupCol), col("n_above"), col("n_below"),
      guarded(col("runs")).as("runs"),
      guarded(when(defined, meanQ.cast("long"))).as("mean_runs_q6"),
      guarded(when(defined, varQ.cast("long"))).as("var_runs_q6"))
  }

  /** DuckDB replay — same lag window, HUGEINT moments. `seriesSql`
    * yields (grp, i, v).
    */
  def oracleSql(seriesSql: String, groupName: String, threshold: Long): String =
    s"""WITH s AS (SELECT grp, i, v > $threshold AS up FROM ($seriesSql)
  WHERE i IS NOT NULL AND v IS NOT NULL AND v <> $threshold),
m AS (SELECT grp, up,
    CASE WHEN lag(up) OVER (PARTITION BY grp ORDER BY i) IS NULL THEN 1
         WHEN lag(up) OVER (PARTITION BY grp ORDER BY i) <> up THEN 1
         ELSE 0 END AS chg
  FROM s),
a AS (SELECT grp,
    CAST(count(*) FILTER (WHERE up) AS HUGEINT) AS n1,
    CAST(count(*) FILTER (WHERE NOT up) AS HUGEINT) AS n2,
    CAST(sum(chg) AS BIGINT) AS runs
  FROM m GROUP BY grp)
SELECT grp AS $groupName, CAST(n1 AS BIGINT) AS n_above,
  CAST(n2 AS BIGINT) AS n_below, runs,
  CASE WHEN n1 > 0 AND n2 > 0 AND n1 + n2 >= 2
       THEN CAST(($Scale * (n1 + n2 + 2 * n1 * n2)) // (n1 + n2) AS BIGINT)
  END AS mean_runs_q6,
  CASE WHEN n1 > 0 AND n2 > 0 AND n1 + n2 >= 2
       THEN CAST(($Scale * 2 * n1 * n2 * (2 * n1 * n2 - n1 - n2))
         // ((n1 + n2) * (n1 + n2) * (n1 + n2 - 1)) AS BIGINT)
  END AS var_runs_q6
FROM a ORDER BY $groupName"""
}
