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
                  tsCol: String): DataFrame = {
    val users = events
      .where(col(userCol).isNotNull && col(tsCol).isNotNull)
      .select(col(userCol).as("__u"),
        (year(col(tsCol)) * 12 + month(col(tsCol))).as("__m"))
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
      .select(col("__age").cast("long").as("age_months"),
        coalesce(col("__ch"), lit(0L)).as("churned"),
        coalesce(col("__ce"), lit(0L)).as("censored"))
    // at_risk(a) = Σ_{a' >= a} (churned + censored): reversed cumsum over
    // the age spine — horizon-bounded, never user-bounded
    val rev = org.apache.spark.sql.expressions.Window
      .orderBy(col("age_months").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    dense
      .withColumn("at_risk", sum(col("churned") + col("censored")).over(rev))
      .select(col("age_months"), col("at_risk"), col("churned"),
        col("censored"),
        expr("CAST((churned * CAST(100000000 AS DECIMAL(38,0))) div at_risk " +
          "AS BIGINT)").as("hazard_e8"))
  }

  /** DuckDB replay of [[hazardCurve]] — same per-user collapse,
    * generate_series spine, reversed running sum, HUGEINT floor div.
    */
  def oracleSql(table: String, userE: String, tsE: String): String =
    s"""WITH u AS (
  SELECT $userE AS u, min(year($tsE) * 12 + month($tsE)) AS f,
    max(year($tsE) * 12 + month($tsE)) AS l
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
SELECT CAST(age AS BIGINT) AS age_months, CAST(at_risk AS BIGINT) AS at_risk,
  churned, censored,
  CAST((CAST(churned AS HUGEINT) * 100000000) // CAST(at_risk AS HUGEINT)
    AS BIGINT) AS hazard_e8
FROM r ORDER BY age_months""".stripMargin
}
