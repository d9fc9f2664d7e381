package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series resampling with gap fill — regularize an irregular event
  * stream onto a fixed grid (per key: one row per interval between its
  * first and last observation, missing intervals forward-filled). The
  * sensor/metrics-preparation step feeding sequence models and the as-of
  * family's fixed-grid sibling ([[graft.llm.AsOf]] aligns to ANOTHER
  * stream's timestamps; this aligns to the clock).
  *
  * Exactness: buckets are Spark's epoch-aligned tumbling `window()` starts
  * (DuckDB `time_bucket` floors identically — the L29 parity), the spine
  * is integer `sequence` arithmetic on those starts, and the per-bucket
  * reducer is `max` (order-independent, no float summation), so the whole
  * result is engine-replayable bit-identically. Each key's spine starts at
  * its own first observed bucket, so forward fill leaves no leading nulls
  * and the fill semantics have no engine-specific null edge.
  *
  * Scale shape: one partial-agg'd shuffle keyed (key, bucket) collapses
  * events to observations; the spine explodes a per-key `sequence` whose
  * length is span/interval — bounded by the retention window, NOT by event
  * count (a whale key with 10⁸ events still yields span/interval spine
  * rows); the fill is one window per key ordered by bucket. No cartesian,
  * nothing driver-side.
  */
object Resample {

  /** (keyCol, bucket, value, observed) per `interval` grid cell between
    * each key's first and last event; `value` is the per-bucket `max` of
    * `valueCol`, forward-filled across unobserved cells.
    */
  def gapFillFfill(events: DataFrame, keyCol: String, tsCol: String,
                   valueCol: String, interval: String = "1 hour"): DataFrame = {
    val observed = events
      .where(col(keyCol).isNotNull && col(tsCol).isNotNull)
      .groupBy(col(keyCol), window(col(tsCol), interval)("start").as("__b"))
      .agg(max(col(valueCol)).as("__v"))
    val spine = observed
      .groupBy(col(keyCol)).agg(min("__b").as("__lo"), max("__b").as("__hi"))
      .select(col(keyCol),
        explode(sequence(col("__lo"), col("__hi"), expr(s"interval $interval")))
          .as("__b"))
    val w = Window.partitionBy(keyCol).orderBy("__b")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(observed, Seq(keyCol, "__b"), "left")
      .select(col(keyCol), col("__b").as("bucket"),
        last(col("__v"), ignoreNulls = true).over(w).as("value"),
        col("__v").isNotNull.as("observed"))
  }

  /** DuckDB replay of [[gapFillFfill]]: `time_bucket` floors,
    * `generate_series` spine, `IGNORE NULLS` forward fill.
    */
  def gapFillOracle(table: String, keyCol: String, tsCol: String,
                    valueCol: String, intervalSql: String = "INTERVAL 1 HOUR"): String =
    s"""WITH obs AS (
  SELECT $keyCol, time_bucket($intervalSql, $tsCol) AS b, max($valueCol) AS v
  FROM $table WHERE $keyCol IS NOT NULL AND $tsCol IS NOT NULL GROUP BY 1, 2),
spine AS (
  SELECT $keyCol, unnest(generate_series(min(b), max(b), $intervalSql)) AS b
  FROM obs GROUP BY $keyCol)
SELECT s.$keyCol, s.b AS bucket,
  last_value(o.v IGNORE NULLS) OVER (PARTITION BY s.$keyCol ORDER BY s.b
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value,
  o.v IS NOT NULL AS observed
FROM spine s LEFT JOIN obs o ON s.$keyCol = o.$keyCol AND s.b = o.b
ORDER BY 1, 2"""
}
