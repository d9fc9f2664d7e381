package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Activity-streak analysis — the engagement readout behind "7-day
  * streak" product mechanics and habit/retention dashboards: per key,
  * how many distinct active days, how many consecutive runs, and the
  * longest run. Classic gaps-and-islands: among a key's DISTINCT active
  * days in order, `day − rank(day)` is constant exactly within a run of
  * consecutive dates, so grouping on that anchor splits runs without any
  * self-join or recursion.
  *
  * Exactness: pure date/integer arithmetic (date_sub by the row rank —
  * both engines subtract days from dates identically); no floats, no
  * session heuristics — a streak is calendar-consecutive by definition.
  *
  * Scale shape: events collapse to DISTINCT (key, day) first (partial-
  * agg'd — the day count bounds everything downstream at 365 rows per
  * key-year whatever the event volume), then one per-key rank window
  * over days (the rank posture at day-cardinality, not event-cardinality)
  * and two group reductions. Rows with NULL key or date drop.
  */
object Streaks {

  /** (keyCol, n_active_days, n_streaks, longest_streak) per key. */
  def activityStreaks(df: DataFrame, keyCol: String, dateCol: String): DataFrame = {
    val days = df
      .where(col(keyCol).isNotNull && col(dateCol).isNotNull)
      .select(col(keyCol), col(dateCol).cast("date").as("__day"))
      .distinct()
    val ord = Window.partitionBy(col(keyCol)).orderBy(col("__day"))
    val runs = days
      .withColumn("__anchor",
        date_sub(col("__day"), row_number().over(ord)))
      .groupBy(col(keyCol), col("__anchor"))
      .agg(count(lit(1)).as("__len"))
    runs.groupBy(col(keyCol))
      .agg(
        sum(col("__len")).cast(LongType).as("n_active_days"),
        count(lit(1)).as("n_streaks"),
        max(col("__len")).as("longest_streak"))
  }

  /** DuckDB replay of [[activityStreaks]] — the same anchor construction
    * (date minus row rank).
    */
  def oracleSql(table: String, keyCol: String, dateCol: String): String =
    s"""WITH days AS (
  SELECT DISTINCT $keyCol AS k, CAST($dateCol AS DATE) AS day
  FROM $table WHERE $keyCol IS NOT NULL AND $dateCol IS NOT NULL),
runs AS (
  SELECT k, day - CAST(row_number() OVER (PARTITION BY k ORDER BY day) AS INT) AS anchor
  FROM days),
g AS (SELECT k, anchor, count(*) AS len FROM runs GROUP BY 1, 2)
SELECT k AS $keyCol, CAST(sum(len) AS BIGINT) AS n_active_days,
  count(*) AS n_streaks, CAST(max(len) AS BIGINT) AS longest_streak
FROM g GROUP BY k ORDER BY k""".stripMargin
}
