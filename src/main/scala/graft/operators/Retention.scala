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
