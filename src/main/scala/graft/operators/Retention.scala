package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cohort retention — the triangular "of users first seen in period P, how
  * many were active again in P+n" matrix every product-analytics stack
  * derives from an event stream (and, for a training-data pipeline, the
  * user-activity weighting signal behind behavioral sampling).
  *
  * Exactness: periods are `date_trunc` floors (Monday-start weeks in both
  * Spark and DuckDB) and offsets are integer day arithmetic
  * (`datediff div 7`), so the matrix is engine-replayable with no
  * timestamp-format or timezone hazards (everything stays in the session
  * calendar).
  *
  * Scale shape: the event stream collapses FIRST to distinct (user,
  * period) — a partial-agg'd shuffle keyed on the user that reduces
  * arbitrarily many events per user-period to one row — then per-user
  * `min` finds the cohort (same key, so AQE coalesces the two stages'
  * exchange), and one join + final aggregate sizes by user-periods, not
  * events. Within a (cohort, offset) cell each user appears exactly once
  * (offset is a bijection of the period given the cohort), so the cell
  * count is a plain `count(*)` — no count-distinct Expand blowup.
  *
  * Reference scope note: fabrix has no event/cohort operators — extension
  * surface beside the windows/sessions/funnel family
  * ([[graft.llm.EventWindows]], [[graft.llm.EventFunnels]]).
  */
object Retention {

  /** (cohort_week, week_offset, active_users) over weekly periods. */
  def weeklyCohorts(events: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val w = events
      .where(col(userCol).isNotNull && col(tsCol).isNotNull)
      .select(col(userCol).as("__u"),
        date_trunc("week", col(tsCol)).cast("date").as("__wk"))
      .distinct()
    val cohorts = w.groupBy("__u").agg(min("__wk").as("cohort_week"))
    w.join(cohorts, "__u")
      .groupBy(col("cohort_week"),
        expr("datediff(__wk, cohort_week) div 7").cast("long").as("week_offset"))
      .agg(count(lit(1)).as("active_users"))
  }

  /** Classic Dn bounded-return retention — "of the users who FIRST
    * appeared on day d, how many came back within exactly 1 / 7 / 30
    * days": the product-analytics headline beside the [[weeklyCohorts]]
    * matrix (the matrix shows the whole surface; Dn gives the three
    * numbers a dashboard tracks). A user counts for dN when ANY activity
    * lands in `(first_day, first_day + N]` — exact integer day
    * arithmetic on epoch days, no calendar types cross the engines.
    *
    * Censoring honesty: a cohort younger than N days cannot have
    * finished its dN window — those cells report NULL, not a
    * falsely-final count (the [[Churn]] right-censoring discipline);
    * the horizon is the corpus' last activity day.
    *
    * Scale shape: one partial-agg'd pass to per-user (first_day,
    * activity-day set distances via min flags — three bounded boolean
    * aggregates, never a day list); cohort rollup is day-cardinality.
    */
  def dnRetention(events: DataFrame, userCol: String, tsCol: String,
                  horizons: Seq[Int] = Seq(1, 7, 30)): DataFrame = {
    require(horizons.nonEmpty && horizons == horizons.sorted &&
      horizons.distinct == horizons && horizons.forall(_ >= 1),
      s"horizons must be distinct ascending positives, got $horizons")
    val day = datediff(col(tsCol).cast("date"), lit("1970-01-01").cast("date"))
      .cast("long")
    val ud = events
      .where(col(userCol).isNotNull && col(tsCol).isNotNull)
      .select(col(userCol).as("__u"), day.as("__d"))
      .distinct()
      .localCheckpoint(true)
    val firsts = ud.groupBy(col("__u")).agg(min(col("__d")).as("__f"))
    val horizon = ud.agg(max(col("__d")).as("__h"))
    val flagExprs = horizons.map { n =>
      max(when(col("__d") > col("__f") &&
        col("__d") <= col("__f") + n, 1L).otherwise(0L)).as(s"__r$n")
    }
    val flags = ud.join(firsts, "__u")
      .groupBy(col("__u"), col("__f"))
      .agg(flagExprs.head, flagExprs.tail: _*)
    val aggExprs = (count(lit(1)).as("n_users") +:
      horizons.map(n => sum(col(s"__r$n")).as(s"__s$n"))) :+
      first(col("__h")).as("__hh")
    flags.crossJoin(broadcast(horizon))
      .groupBy(col("__f"))
      .agg(aggExprs.head, aggExprs.tail: _*)
      .select(col("__f").as("cohort_day") +: col("n_users") +:
        horizons.map(n =>
          when(col("__hh") >= col("__f") + n, col(s"__s$n"))
            .otherwise(lit(null).cast("long")).as(s"d$n")): _*)
  }

  /** DuckDB replay of [[dnRetention]]. */
  def dnOracle(table: String, userE: String, tsE: String,
               horizons: Seq[Int] = Seq(1, 7, 30)): String = {
    val flagCols = horizons.map(n =>
      s"max(CASE WHEN ud.d > f.f AND ud.d <= f.f + $n THEN 1 ELSE 0 END) AS r$n")
      .mkString(", ")
    val outCols = horizons.map(n =>
      s"CASE WHEN h.h >= f + $n THEN CAST(sum(r$n) AS BIGINT) END AS d$n")
      .mkString(", ")
    s"""WITH ud AS (
  SELECT DISTINCT $userE AS u,
    CAST(date_diff('day', DATE '1970-01-01', CAST($tsE AS DATE)) AS BIGINT) AS d
  FROM $table WHERE $userE IS NOT NULL AND $tsE IS NOT NULL),
f AS (SELECT u, min(d) AS f FROM ud GROUP BY u),
h AS (SELECT max(d) AS h FROM ud),
fl AS (SELECT ud.u, f.f, $flagCols
  FROM ud JOIN f USING (u) GROUP BY ud.u, f.f)
SELECT f AS cohort_day, CAST(count(*) AS BIGINT) AS n_users, $outCols
FROM fl CROSS JOIN h GROUP BY f, h.h ORDER BY cohort_day""".stripMargin
  }

  /** DuckDB replay of [[weeklyCohorts]] — same floors, same integer
    * offsets.
    */
  def weeklyOracle(table: String, userE: String, tsE: String): String =
    s"""WITH w AS (
  SELECT DISTINCT $userE AS u, CAST(date_trunc('week', $tsE) AS DATE) AS wk
  FROM $table WHERE $userE IS NOT NULL AND $tsE IS NOT NULL),
c AS (SELECT u, min(wk) AS cohort_week FROM w GROUP BY u)
SELECT c.cohort_week, CAST(date_diff('day', c.cohort_week, w.wk) // 7 AS BIGINT) AS week_offset,
  count(*) AS active_users
FROM w JOIN c ON w.u = c.u
GROUP BY 1, 2 ORDER BY 1, 2"""
}
