package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Monotonicity audit — does a value actually increase along a key's
  * declared order? The telemetry-quality check behind clock-skew
  * detection (events ordered by sequence id whose timestamps run
  * BACKWARD = device clock drift or ingestion reordering), version
  * counters that regress, and offset logs that jump back. Per key, in
  * strict (ordCol, and ordCol must be unique per key) order: how many
  * adjacent steps strictly DECREASE, the worst single drop, and the
  * first offending order position — enough to alert on and to find the
  * culprit without shipping every violation row.
  *
  * Violation-keyed output: clean keys are absent. NULL key/ord/value
  * rows drop (unrankable/unmeasurable — count missingness with
  * [[Completeness]]).
  *
  * Scale shape: one per-key lag window (sessionized posture, one-row
  * state) then a partial-agg'd groupBy; a whale key is wall-clock only.
  */
object Monotonic {

  /** (key, n_steps, n_inversions, worst_drop, first_bad_ord) for every
    * key with at least one strictly-decreasing adjacent step.
    */
  def inversions(df: DataFrame, keyCol: String, ordCol: String,
                 valueCol: String): DataFrame = {
    Seq(ordCol, valueCol).foreach(c =>
      graft.Guards.requireIntegral(df, c, "inversions"))
    val w = Window.partitionBy(col("key")).orderBy(col("__o"))
    df
      .where(col(keyCol).isNotNull && col(ordCol).isNotNull &&
        col(valueCol).isNotNull)
      .select(col(keyCol).as("key"), col(ordCol).cast("long").as("__o"),
        col(valueCol).cast("long").as("__v"))
      .withColumn("__pv", lag(col("__v"), 1).over(w))
      .where(col("__pv").isNotNull)
      .groupBy(col("key"))
      .agg(count(lit(1)).as("n_steps"),
        sum(when(col("__v") < col("__pv"), 1L).otherwise(0L))
          .as("n_inversions"),
        max(when(col("__v") < col("__pv"), col("__pv") - col("__v")))
          .as("worst_drop"),
        min(when(col("__v") < col("__pv"), col("__o"))).as("first_bad_ord"))
      .where(col("n_inversions") > 0)
  }

  /** DuckDB replay of [[inversions]]. */
  def oracleSql(table: String, keyCol: String, ordCol: String,
                valueCol: String): String =
    s"""WITH m AS (
  SELECT $keyCol AS k, CAST($ordCol AS BIGINT) AS o, CAST($valueCol AS BIGINT) AS v
  FROM $table
  WHERE $keyCol IS NOT NULL AND ($ordCol) IS NOT NULL AND ($valueCol) IS NOT NULL),
p AS (SELECT k, o, v, lag(v) OVER (PARTITION BY k ORDER BY o) AS pv FROM m),
a AS (SELECT k, CAST(count(*) AS BIGINT) AS n_steps,
    CAST(count(*) FILTER (WHERE v < pv) AS BIGINT) AS n_inversions,
    CAST(max(CASE WHEN v < pv THEN pv - v END) AS BIGINT) AS worst_drop,
    CAST(min(CASE WHEN v < pv THEN o END) AS BIGINT) AS first_bad_ord
  FROM p WHERE pv IS NOT NULL GROUP BY k)
SELECT k AS key, n_steps, n_inversions, worst_drop, first_bad_ord
FROM a WHERE n_inversions > 0 ORDER BY key""".stripMargin
}
