package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval-union coverage — the overlap-safe total: per key, how much
  * wall-clock its intervals actually COVER. Summing durations
  * double-counts every overlap (two parallel 1-hour sessions are one
  * covered hour), so uptime-from-heartbeats, billable-time-from-
  * sessions, and machine-utilization readouts all need the union, not
  * the sum. Merged-interval COUNT comes free (n_spans — "how many
  * distinct on-periods").
  *
  * Shape: classic sweep with a running maximum — an interval starts a
  * new covered span exactly when its start clears everything seen
  * before (`start ≥ max(end) over preceding`); covered time accumulates
  * `min(end, run) − max(start, prev_run)` clamped at 0... reduced here
  * to the exact per-row increment `max(0, end − max(start, prev_max))`
  * which telescopes to the union length. All microsecond integers; the
  * per-key window is interval-cardinality, spill-backed (the rank
  * posture).
  *
  * Contracts: intervals are `[from, to)`; rows with NULL endpoints or
  * `to ≤ from` carry no coverage and drop; keys keep their NULL stratum
  * (windows partition it like any group).
  */
object IntervalCoverage {

  /** (keyCol, n_intervals, n_spans, covered_us) per key. */
  def coverage(df: DataFrame, keyCol: String, fromCol: String,
               toCol: String): DataFrame = {
    val f = unix_micros(col(fromCol).cast("timestamp"))
    val t = unix_micros(col(toCol).cast("timestamp"))
    val rows = df
      .where(col(fromCol).isNotNull && col(toCol).isNotNull && t > f)
      .select(col(keyCol), f.as("__f"), t.as("__t"))
    val prev = Window.partitionBy(col(keyCol)).orderBy(col("__f"), col("__t"))
      .rowsBetween(Window.unboundedPreceding, -1)
    rows
      .withColumn("__pmax", max(col("__t")).over(prev))
      // increment: the part of [f, t) past everything already covered
      .withColumn("__inc",
        greatest(lit(0L), col("__t") - greatest(col("__f"),
          coalesce(col("__pmax"), col("__f")))))
      // STRICT >: under [from, to) semantics an interval starting exactly
      // at the running max end is contiguous — back-to-back sessions are
      // one on-period, not two
      .withColumn("__new",
        when(col("__pmax").isNull || col("__f") > col("__pmax"), 1L).otherwise(0L))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_intervals"),
        sum(col("__new")).as("n_spans"),
        sum(col("__inc")).as("covered_us"))
  }

  /** DuckDB replay of [[coverage]] — same sweep arithmetic. */
  def oracleSql(table: String, keyCol: String, fromCol: String,
                toCol: String): String =
    s"""WITH r AS (
  SELECT $keyCol AS k, epoch_us(CAST($fromCol AS TIMESTAMP)) AS f,
    epoch_us(CAST($toCol AS TIMESTAMP)) AS t
  FROM $table
  WHERE $fromCol IS NOT NULL AND $toCol IS NOT NULL
    AND epoch_us(CAST($toCol AS TIMESTAMP)) > epoch_us(CAST($fromCol AS TIMESTAMP))),
w AS (SELECT k, f, t,
    max(t) OVER (PARTITION BY k ORDER BY f, t
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
  FROM r)
SELECT k AS $keyCol, count(*) AS n_intervals,
  CAST(sum(CASE WHEN pmax IS NULL OR f > pmax THEN 1 ELSE 0 END) AS BIGINT) AS n_spans,
  CAST(sum(greatest(0, t - greatest(f, coalesce(pmax, f)))) AS BIGINT) AS covered_us
FROM w GROUP BY k ORDER BY k""".stripMargin
}
