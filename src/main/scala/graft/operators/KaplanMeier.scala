package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Kaplan–Meier survival curve under right-censoring — the CURVE the
  * [[LogRank]] test compares: per stratum, the product-limit estimate
  * S(t) = Π_{u ≤ t} (n_u − d_u)/n_u over event times, with subjects
  * whose observation ended without the event (still active at the data
  * edge) counted as AT RISK until their censoring time and never as
  * deaths — the estimator that makes "median customer lifetime" honest
  * when half the customers haven't churned yet (a naive mean-of-observed
  * lifetimes is biased low by exactly the censored mass).
  *
  * Exactness split (the [[LogRank]] convention): the at-risk/death/censor
  * counts per event time are EXACT integers (n_t = N − #{duration < t},
  * the standard deaths-before-censorings-at-t tie rule); the survival
  * product publishes through the quantized-ln convention — per event time
  * one single-double-chain step ⌊10⁶·ln((n−d)/n)⌋ ([[graft.text.Keyness]]
  * discipline), and surv_lnq6 is the running SUM of the quantized steps
  * (so S(t) ≈ e^{surv_lnq6/10⁶}, monotone non-increasing by
  * construction). When n_t = d_t the survival hits EXACT zero — ln is
  * undefined, so surv_lnq6 publishes NULL from that time on (NULL = "the
  * curve is at zero", a terminal state, not missing data; the hit-zero
  * flag rides a cumulative max so the NULL propagates even past later
  * pure-censoring times).
  *
  * Scale shape: one partial-agg'd (group, t) collapse (a million subjects
  * with the same lifetime cost one row), then per-GROUP ordered windows
  * over distinct times — the walk parallelizes across strata and is
  * value-cardinality-sized within one (the [[KsDistance]] posture,
  * partitioned). Contracts: negative durations raise in-plan; event must
  * be 0/1 (a count is a different operator); NULL duration/event rows
  * drop; NULL groups are a real stratum.
  */
object KaplanMeier {

  val Scale = 1000000L

  /** One row per (group, event time): (groupCol, t, n_risk, d, c,
    * surv_lnq6) — c the subjects censored AT t (context, not part of the
    * factor), surv_lnq6 the cumulative quantized log-survival.
    */
  def curve(df: DataFrame, groupCol: String, durCol: String,
            eventCol: String): DataFrame = {
    graft.Guards.requireIntegral(df, durCol, "kaplanMeier")
    graft.Guards.requireIntegral(df, eventCol, "kaplanMeier")
    val subj = df
      .where(col(durCol).isNotNull && col(eventCol).isNotNull)
      .select(col(groupCol),
        when(col(durCol).cast(LongType) < 0L, raise_error(concat(
          lit("kaplanMeier: negative duration "), col(durCol).cast("string")))
          .cast(LongType))
          .otherwise(col(durCol).cast(LongType)).as("__t"),
        when(!col(eventCol).cast(LongType).isin(0L, 1L), raise_error(concat(
          lit("kaplanMeier: event must be 0 or 1, got "),
          col(eventCol).cast("string"))).cast(LongType))
          .otherwise(col(eventCol).cast(LongType)).as("__e"))
    val times = subj.groupBy(col(groupCol), col("__t"))
      .agg(sum(col("__e")).as("__d"),
        (count(lit(1)) - sum(col("__e"))).as("__c"))
    val ord = Window.partitionBy(col(groupCol)).orderBy(col("__t"))
    val prev = ord.rowsBetween(Window.unboundedPreceding, -1)
    val cum = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val whole = Window.partitionBy(col(groupCol))
    val stepped = times
      .withColumn("__n",
        sum(col("__d") + col("__c")).over(whole)
          - coalesce(sum(col("__d") + col("__c")).over(prev), lit(0L)))
      // one double chain per event time; pure-censoring times step 0
      .withColumn("__step",
        when(col("__d") > 0L && col("__n") > col("__d"),
          floor(lit(Scale.toDouble) *
            log((col("__n") - col("__d")).cast("double") /
              col("__n").cast("double"))).cast(LongType))
          .otherwise(lit(0L)))
      .withColumn("__zero",
        max(when(col("__d") > 0L && col("__n") === col("__d"), 1L)
          .otherwise(0L)).over(cum))
      .withColumn("__lnq", sum(col("__step")).over(cum))
    stepped
      .where(col("__d") > 0L)
      .select(col(groupCol), col("__t").as("t"), col("__n").as("n_risk"),
        col("__d").as("d"), col("__c").as("c"),
        when(col("__zero") === 1L, lit(null).cast(LongType))
          .otherwise(col("__lnq")).as("surv_lnq6"))
  }

  /** DuckDB replay of [[curve]] — same collapse, same windows, same
    * single-double-chain floors; `subjectsSql` yields (grp, t, e).
    */
  def oracleSql(subjectsSql: String, groupName: String): String =
    s"""WITH times AS (
  SELECT grp, t, sum(e) AS d, count(*) - sum(e) AS c
  FROM ($subjectsSql) WHERE t IS NOT NULL AND e IS NOT NULL
  GROUP BY grp, t),
walk AS (
  SELECT grp, t, d, c,
    sum(d + c) OVER (PARTITION BY grp)
      - coalesce(sum(d + c) OVER (PARTITION BY grp ORDER BY t
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n,
    CASE WHEN d > 0 AND sum(d + c) OVER (PARTITION BY grp)
      - coalesce(sum(d + c) OVER (PARTITION BY grp ORDER BY t
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) > d
      THEN CAST(floor(1000000.0 * ln(
        CAST((sum(d + c) OVER (PARTITION BY grp)
          - coalesce(sum(d + c) OVER (PARTITION BY grp ORDER BY t
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)) - d
          AS DOUBLE)
        / CAST(sum(d + c) OVER (PARTITION BY grp)
          - coalesce(sum(d + c) OVER (PARTITION BY grp ORDER BY t
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
          AS DOUBLE))) AS BIGINT)
      ELSE 0 END AS step,
    CASE WHEN d > 0 AND sum(d + c) OVER (PARTITION BY grp)
      - coalesce(sum(d + c) OVER (PARTITION BY grp ORDER BY t
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) = d
      THEN 1 ELSE 0 END AS iszero
  FROM times),
cumul AS (
  SELECT grp, t, n, d, c,
    sum(step) OVER (PARTITION BY grp ORDER BY t
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS lnq,
    max(iszero) OVER (PARTITION BY grp ORDER BY t
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS hitzero
  FROM walk)
SELECT grp AS $groupName, t, CAST(n AS BIGINT) AS n_risk,
  CAST(d AS BIGINT) AS d, CAST(c AS BIGINT) AS c,
  CASE WHEN hitzero = 1 THEN NULL ELSE CAST(lnq AS BIGINT) END AS surv_lnq6
FROM cumul WHERE d > 0
ORDER BY $groupName, t"""
}
