package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Discrete-time churn hazard curves — the lifecycle readout behind
  * "when do we lose them": for each age (months since first activity),
  * how many users were still at risk, how many churned exactly there,
  * and the hazard rate. The survival-analysis twin of [[Retention]]
  * (retention asks who CAME BACK at age a; hazard asks who LEFT at a,
  * conditioned on having survived to a — the quantity lifecycle
  * interventions are timed against).
  *
  * Month indices are integers (`year·12 + month`, the [[CohortLtv]]
  * discipline). Per user: `first = min(month)`, `last = max(month)`,
  * lifetime age `last − first`. RIGHT-CENSORING is handled honestly —
  * the Kaplan–Meier discipline: a user whose last activity IS the
  * corpus horizon month hasn't churned, they just ran out of
  * observation window; they count as `censored` at their current age,
  * never as churned, and hazard divides only the observed deaths:
  *
  *   at_risk(a)   = #{ users with lifetime ≥ a }
  *   churned(a)   = #{ lifetime = a ∧ last < horizon }
  *   censored(a)  = #{ lifetime = a ∧ last = horizon }
  *   hazard_e8    = ⌊10⁸ · churned(a) / at_risk(a)⌋
  *
  * (lifetime ≥ a implies the user was observable at age a, since
  * last ≤ horizon.) All exact integers — non-negative, so truncating
  * div IS floor on both engines.
  *
  * Scale shape: ONE partial-agg'd pass collapses events to per-user
  * (first, last) — a 10⁸-event whale user is one row downstream; ages
  * aggregate to an age-cardinality table; `at_risk` is a reversed
  * cumulative sum over AGES (horizon-bounded window, hundreds of rows);
  * the horizon is a 1-row broadcast.
  *
  * Contract: NULL user/ts rows drop; ages densify over 0..max lifetime
  * (an age nobody exited at still shows its at-risk population — the
  * [[DenseSeries]] explicit-zero posture).
  */
object Churn {

  /** (age_months, at_risk, churned, censored, hazard_e8). */
  def hazardCurve(events: DataFrame, userCol: String,
                  tsCol: String): DataFrame =
    curveBy(events, userCol, tsCol,
      c => year(c) * 12 + month(c), "age_months")

  /** [[hazardCurve]] at DAY granularity (`age_days`) — the unit for
    * event streams shorter than a month; same censoring contract.
    */
  def hazardCurveDaily(events: DataFrame, userCol: String,
                       tsCol: String): DataFrame =
    curveBy(events, userCol, tsCol,
      c => datediff(c.cast("date"), lit("1970-01-01").cast("date"))
        .cast("long"),
      "age_days")

  private def curveBy(events: DataFrame, userCol: String, tsCol: String,
                      unit: org.apache.spark.sql.Column =>
                        org.apache.spark.sql.Column,
                      ageName: String): DataFrame = {
    val users = events
      .where(col(userCol).isNotNull && col(tsCol).isNotNull)
      .select(col(userCol).as("__u"), unit(col(tsCol)).as("__m"))
      .groupBy(col("__u"))
      .agg(min(col("__m")).as("__first"), max(col("__m")).as("__last"))
      .localCheckpoint(true)
    val horizon = users.agg(max(col("__last")).as("__h"))
    val perUser = users.crossJoin(broadcast(horizon))
      .select((col("__last") - col("__first")).as("__age"),
        (col("__last") < col("__h")).as("__churned"))
    val byAge = perUser.groupBy(col("__age"))
      .agg(sum(when(col("__churned"), 1L).otherwise(0L)).as("__ch"),
        sum(when(col("__churned"), 0L).otherwise(1L)).as("__ce"))
    // dense age spine 0..max lifetime, explicit zero rows
    val spine = perUser.agg(max(col("__age")).as("__maxa"))
      .select(explode(sequence(lit(0), col("__maxa").cast("int"))).as("__age"))
    val dense = spine.join(byAge, Seq("__age"), "left")
      .select(col("__age").cast("long").as(ageName),
        coalesce(col("__ch"), lit(0L)).as("churned"),
        coalesce(col("__ce"), lit(0L)).as("censored"))
    // at_risk(a) = Σ_{a' >= a} (churned + censored): reversed cumsum over
    // the age spine — horizon-bounded, never user-bounded
    val rev = org.apache.spark.sql.expressions.Window
      .orderBy(col(ageName).desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    dense
      .withColumn("at_risk", sum(col("churned") + col("censored")).over(rev))
      .select(col(ageName), col("at_risk"), col("churned"),
        col("censored"),
        expr("CAST((churned * CAST(100000000 AS DECIMAL(38,0))) div at_risk " +
          "AS BIGINT)").as("hazard_e8"))
  }

  /** DuckDB replay of [[hazardCurve]] — same per-user collapse,
    * generate_series spine, reversed running sum, HUGEINT floor div.
    */
  def oracleSql(table: String, userE: String, tsE: String): String =
    oracleBy(table, userE, s"year($tsE) * 12 + month($tsE)", tsE,
      "age_months")

  /** DuckDB replay of [[hazardCurveDaily]]. */
  def dailyOracleSql(table: String, userE: String, tsE: String): String =
    oracleBy(table, userE,
      s"date_diff('day', DATE '1970-01-01', CAST($tsE AS DATE))", tsE,
      "age_days")

  private def oracleBy(table: String, userE: String, unitE: String,
                       tsE: String, ageName: String): String =
    s"""WITH u AS (
  SELECT $userE AS u, min($unitE) AS f,
    max($unitE) AS l
  FROM $table WHERE $userE IS NOT NULL AND $tsE IS NOT NULL GROUP BY 1),
h AS (SELECT max(l) AS h FROM u),
pu AS (SELECT u.l - u.f AS age, u.l < h.h AS churned FROM u CROSS JOIN h),
ba AS (SELECT age, CAST(count(*) FILTER (WHERE churned) AS BIGINT) AS ch,
    CAST(count(*) FILTER (WHERE NOT churned) AS BIGINT) AS ce
  FROM pu GROUP BY age),
sp AS (SELECT unnest(generate_series(0, (SELECT max(age) FROM pu))) AS age),
d AS (SELECT sp.age, coalesce(ba.ch, 0) AS churned, coalesce(ba.ce, 0) AS censored
  FROM sp LEFT JOIN ba ON sp.age = ba.age),
r AS (SELECT age, churned, censored,
    sum(churned + censored) OVER (ORDER BY age DESC ROWS UNBOUNDED PRECEDING) AS at_risk
  FROM d)
SELECT CAST(age AS BIGINT) AS $ageName, CAST(at_risk AS BIGINT) AS at_risk,
  churned, censored,
  CAST((CAST(churned AS HUGEINT) * 100000000) // CAST(at_risk AS HUGEINT)
    AS BIGINT) AS hazard_e8
FROM r ORDER BY $ageName""".stripMargin

  /** Kaplan–Meier survival on top of [[hazardCurve]], in LOG space with
    * PER-STEP quantization — the product estimator Π(1 − dᵢ/nᵢ) is a
    * float product no two engines replay, but its log is a SUM of
    * per-age terms, and each term quantizes independently (the
    * [[RetrievalMetrics.ndcgAtK]] / Drift quantized-ln discipline):
    *
    *   term(a) = ⌊10⁶·ln((at_risk−churned)/at_risk)⌋   (0 when nobody
    *     churned at a — ln 1 shortcut, no float noise)
    *   ln_surv_q6(a) = Σ_{a' ≤ a} term(a')   (an exact integer running
    *     sum over the age spine; survival ≈ exp(ln_surv_q6/10⁶))
    *
    * When churned = at_risk at some age, survival hits EXACTLY zero and
    * stays there — ln is −∞, so every age from that point reports NULL
    * ln_surv_q6 (the zero-survival marker; a window sum would silently
    * SKIP a NULL term, so the zero-step is tracked by a separate
    * running count, never by NULL arithmetic).
    *
    * Declared term-floored semantics, same honesty as NDCG: the
    * quantization IS the contract, not an approximation engines could
    * disagree on. Age-spine-sized windows (hundreds of rows).
    */
  def kmSurvival(events: DataFrame, userCol: String,
                 tsCol: String): DataFrame =
    kmFrom(hazardCurve(events, userCol, tsCol), "age_months")

  /** [[kmSurvival]] at DAY granularity. */
  def kmSurvivalDaily(events: DataFrame, userCol: String,
                      tsCol: String): DataFrame =
    kmFrom(hazardCurveDaily(events, userCol, tsCol), "age_days")

  private def kmFrom(hz: DataFrame, ageName: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col(ageName).asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val term = when(col("at_risk") === col("churned"), lit(0L))
      .when(col("churned") === 0L, lit(0L))
      .otherwise(floor(lit(1000000.0) *
        log((col("at_risk") - col("churned")).cast("double") /
          col("at_risk").cast("double"))).cast("long"))
    hz
      .withColumn("__z",
        sum((col("at_risk") === col("churned")).cast("long")).over(w))
      .withColumn("ln_surv_q6",
        when(col("__z") > 0, lit(null).cast("long"))
          .otherwise(sum(term).over(w)))
      .drop("__z")
  }

  /** DuckDB replay of [[kmSurvival]] — the [[oracleSql]] body as a CTE
    * plus the same per-term quantized chain and zero-step tracking.
    */
  def kmOracleSql(table: String, userE: String, tsE: String): String =
    kmOracleBy(oracleSql(table, userE, tsE), "age_months")

  /** DuckDB replay of [[kmSurvivalDaily]]. */
  def kmDailyOracleSql(table: String, userE: String, tsE: String): String =
    kmOracleBy(dailyOracleSql(table, userE, tsE), "age_days")

  private def kmOracleBy(baseSql: String, ageName: String): String = {
    val base = baseSql.replaceFirst(s"ORDER BY $ageName$$", "")
    s"""WITH hz AS ($base)
SELECT $ageName, at_risk, churned, censored, hazard_e8,
  CASE WHEN sum(CASE WHEN at_risk = churned THEN 1 ELSE 0 END)
         OVER (ORDER BY $ageName ASC ROWS UNBOUNDED PRECEDING) > 0
       THEN NULL
       ELSE CAST(sum(CASE WHEN at_risk = churned THEN 0
                     WHEN churned = 0 THEN 0
                     ELSE CAST(floor(1000000.0 *
                       ln(CAST(at_risk - churned AS DOUBLE)
                          / CAST(at_risk AS DOUBLE))) AS BIGINT) END)
         OVER (ORDER BY $ageName ASC ROWS UNBOUNDED PRECEDING) AS BIGINT)
  END AS ln_surv_q6
FROM hz ORDER BY $ageName"""
  }

  /** Nelson–Aalen cumulative hazard on top of [[hazardCurve]] — the
    * RATIONAL survival readout beside [[kmSurvival]]'s log-space curve:
    * H(t) = Σ_{ages ≤ t} dᵢ/nᵢ, the estimator of cumulative hazard whose
    * terms are pure fractions, so unlike KM's ln chain the WHOLE curve is
    * exact integers end-to-end and gate-grade: `na_q6` cumulates
    * per-term-floored `⌊10⁶·churned/at_risk⌋` (floors sum exactly —
    * declared, replayable) and `na_var_q12` cumulates the Aalen variance
    * terms `⌊10¹²·churned/at_risk²⌋` (products ride DECIMAL(38,0) so a
    * 10⁹-user cohort cannot overflow the numerator). Interpretation:
    * survival ≈ exp(−H); H sums what KM multiplies.
    *
    * Scale shape: inherits the hazard spine (horizon-bounded ages, never
    * user-bounded); the cumulation is one unpartitioned window over that
    * ages-sized spine (the [[kmSurvival]] posture).
    */
  def nelsonAalen(events: DataFrame, userCol: String,
                  tsCol: String): DataFrame =
    naFrom(hazardCurve(events, userCol, tsCol), "age_months")

  /** [[nelsonAalen]] at DAY granularity. */
  def nelsonAalenDaily(events: DataFrame, userCol: String,
                       tsCol: String): DataFrame =
    naFrom(hazardCurveDaily(events, userCol, tsCol), "age_days")

  private def naFrom(hz: DataFrame, ageName: String): DataFrame = {
    val dec = "decimal(38,0)"
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col(ageName).asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val term = call_function("div",
      (lit(1000000L).cast(dec) * col("churned").cast(dec)).cast(dec),
      col("at_risk").cast(dec)).cast("long")
    val vterm = call_function("div",
      (lit(1000000000000L).cast(dec) * col("churned").cast(dec)).cast(dec),
      (col("at_risk").cast(dec) * col("at_risk").cast(dec)).cast(dec))
      .cast("long")
    hz
      .withColumn("na_q6", sum(term).over(w))
      .withColumn("na_var_q12", sum(vterm).over(w))
  }

  /** DuckDB replay of [[nelsonAalen]] — the hazard CTE plus the same
    * per-term-floored cumulative sums.
    */
  def naOracleSql(table: String, userE: String, tsE: String): String =
    naOracleBy(oracleSql(table, userE, tsE), "age_months")

  /** DuckDB replay of [[nelsonAalenDaily]]. */
  def naDailyOracleSql(table: String, userE: String, tsE: String): String =
    naOracleBy(dailyOracleSql(table, userE, tsE), "age_days")

  private def naOracleBy(baseSql: String, ageName: String): String = {
    val base = baseSql.replaceFirst(s"ORDER BY $ageName$$", "")
    s"""WITH hz AS ($base)
SELECT $ageName, at_risk, churned, censored, hazard_e8,
  CAST(sum(CAST((CAST(churned AS HUGEINT) * 1000000)
      // CAST(at_risk AS HUGEINT) AS BIGINT))
    OVER (ORDER BY $ageName ASC ROWS UNBOUNDED PRECEDING) AS BIGINT) AS na_q6,
  CAST(sum(CAST((CAST(churned AS HUGEINT) * 1000000000000)
      // (CAST(at_risk AS HUGEINT) * CAST(at_risk AS HUGEINT)) AS BIGINT))
    OVER (ORDER BY $ageName ASC ROWS UNBOUNDED PRECEDING) AS BIGINT) AS na_var_q12
FROM hz ORDER BY $ageName"""
  }
}
