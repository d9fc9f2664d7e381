package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Trailing-window distinct actives — the DAU/WAU/MAU family computed
  * EXACTLY: for every day, how many distinct keys were active in the
  * trailing `windowDays` window ending that day. The standard engagement
  * denominator (WAU = 7, MAU = 28/30) and the numerator of stickiness
  * (DAU/WAU) — a plain per-day count distinct answers only the window=1
  * case, and windowed count distinct does NOT decompose into daily
  * counts (the same user on Monday and Tuesday is one WAU, two DAUs).
  *
  * Shape: activity first collapses to DISTINCT (key, day) — the
  * partial-agg'd cut that bounds everything downstream at active-days,
  * not events — then each (key, day) contributes to its `windowDays`
  * covering window-end days via a scan-stage `sequence` explode (a
  * constant ×w expand, the [[graft.llm.EventWindows.hopping]] posture),
  * and one exact count-distinct per end day (Spark's two-level expand
  * aggregation — partial-agg'd, whale-day safe). No self-join, no
  * window function, no sketch: the result is exact and replays in SQL.
  *
  * Reported days are exactly those whose trailing window contains ≥1
  * active key (leading ramp-up days report their partial windows — the
  * standard dashboard convention). NULL keys/timestamps drop.
  */
object TrailingActives {

  /** (day, n_active) — distinct `keyCol` values active in
    * [day − windowDays + 1, day].
    */
  def trailingActives(df: DataFrame, tsCol: String, keyCol: String,
                      windowDays: Int = 7): DataFrame = {
    require(windowDays >= 1, s"windowDays must be >= 1, got $windowDays")
    val days = df
      .where(col(keyCol).isNotNull && col(tsCol).isNotNull)
      .select(col(keyCol).as("__k"), col(tsCol).cast("date").as("__day"))
      .distinct()
    days
      .select(col("__k"),
        explode(sequence(col("__day"),
          date_add(col("__day"), windowDays - 1))).as("day"))
      .groupBy(col("day"))
      .agg(countDistinct(col("__k")).as("n_active"))
  }

  /** DuckDB replay of [[trailingActives]]. */
  def oracleSql(table: String, tsCol: String, keyCol: String,
                windowDays: Int = 7): String =
    s"""WITH days AS (
  SELECT DISTINCT $keyCol AS k, CAST($tsCol AS DATE) AS day
  FROM $table WHERE $keyCol IS NOT NULL AND $tsCol IS NOT NULL),
e AS (SELECT k,
    CAST(unnest(generate_series(day, day + INTERVAL ${windowDays - 1} DAY,
      INTERVAL 1 DAY)) AS DATE) AS day
  FROM days)
SELECT day, CAST(count(DISTINCT k) AS BIGINT) AS n_active
FROM e GROUP BY day ORDER BY day""".stripMargin
}
