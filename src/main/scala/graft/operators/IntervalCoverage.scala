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

  /** Interval-set difference — |union(base) \ union(minus)| per key:
    * the SLA arithmetic `coverage` cannot express ("uptime NET of
    * maintenance windows", "billable time net of holds"): subtracting
    * two coverage totals is wrong whenever an exclusion window falls
    * outside — or half-overlaps — the covered time. Runs as one
    * boundary sweep: ±1 depth events from both interval sets, collapsed
    * per (key, position) (a 10⁹-interval whale position is one event
    * row), two running depth sums, and the segment between consecutive
    * positions counts exactly when base depth > 0 AND minus depth = 0.
    * Same `[from, to)` / NULL / empty-interval contracts as
    * [[coverage]]; keys appearing only under `minus` report net 0 with
    * n_base = 0 (the honest "nothing to protect" row).
    */
  def subtractCoverage(base: DataFrame, minus: DataFrame, keyCol: String,
                       fromCol: String, toCol: String): DataFrame = {
    def events(df: DataFrame, aSide: Boolean) = {
      val f = unix_micros(col(fromCol).cast("timestamp"))
      val t = unix_micros(col(toCol).cast("timestamp"))
      val valid = df
        .where(col(fromCol).isNotNull && col(toCol).isNotNull && t > f)
        .select(col(keyCol), f.as("__fp"), t.as("__tp"))
      val da = if (aSide) 1L else 0L
      val db = if (aSide) 0L else 1L
      valid.select(col(keyCol), col("__fp").as("__pos"), lit(da).as("__da"),
          lit(db).as("__db"), lit(da).as("__nb"), lit(db).as("__nm"))
        .union(valid.select(col(keyCol), col("__tp").as("__pos"),
          lit(-da).as("__da"), lit(-db).as("__db"), lit(0L).as("__nb"),
          lit(0L).as("__nm")))
    }
    val byPos = events(base, aSide = true).union(events(minus, aSide = false))
      .groupBy(col(keyCol), col("__pos"))
      .agg(sum(col("__da")).as("__da"), sum(col("__db")).as("__db"),
        sum(col("__nb")).as("__nb"), sum(col("__nm")).as("__nm"))
    val run = Window.partitionBy(col(keyCol)).orderBy(col("__pos").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ord = Window.partitionBy(col(keyCol)).orderBy(col("__pos").asc)
    byPos
      .withColumn("__ca", sum(col("__da")).over(run))
      .withColumn("__cb", sum(col("__db")).over(run))
      .withColumn("__seg",
        coalesce(lead(col("__pos"), 1).over(ord) - col("__pos"), lit(0L)))
      .groupBy(col(keyCol))
      .agg(sum(col("__nb")).as("n_base"), sum(col("__nm")).as("n_minus"),
        sum(when(col("__ca") > 0L && col("__cb") === 0L, col("__seg"))
          .otherwise(0L)).as("net_us"))
  }

  /** DuckDB replay of [[subtractCoverage]] — the same boundary sweep;
    * `baseSql`/`minusSql` must yield ($keyCol, $fromCol, $toCol).
    */
  def subtractOracle(baseSql: String, minusSql: String, keyCol: String,
                     fromCol: String, toCol: String): String = {
    def side(sql: String, da: Long, db: Long) =
      s"""SELECT $keyCol AS k, epoch_us(CAST($fromCol AS TIMESTAMP)) AS pos,
    $da AS da, $db AS db, $da AS nb, $db AS nm
  FROM ($sql) WHERE $fromCol IS NOT NULL AND $toCol IS NOT NULL
    AND epoch_us(CAST($toCol AS TIMESTAMP)) > epoch_us(CAST($fromCol AS TIMESTAMP))
  UNION ALL
  SELECT $keyCol, epoch_us(CAST($toCol AS TIMESTAMP)),
    ${-da}, ${-db}, 0, 0
  FROM ($sql) WHERE $fromCol IS NOT NULL AND $toCol IS NOT NULL
    AND epoch_us(CAST($toCol AS TIMESTAMP)) > epoch_us(CAST($fromCol AS TIMESTAMP))"""
    s"""WITH ev AS (
  ${side(baseSql, 1, 0)}
  UNION ALL
  ${side(minusSql, 0, 1)}),
bp AS (SELECT k, pos, sum(da) AS da, sum(db) AS db,
    sum(nb) AS nb, sum(nm) AS nm
  FROM ev GROUP BY k, pos),
sw AS (SELECT k, pos, nb, nm,
    sum(da) OVER win AS ca, sum(db) OVER win AS cb,
    coalesce(lead(pos) OVER (PARTITION BY k ORDER BY pos ASC) - pos, 0)
      AS seg
  FROM bp
  WINDOW win AS (PARTITION BY k ORDER BY pos ASC ROWS UNBOUNDED PRECEDING))
SELECT k AS $keyCol, CAST(sum(nb) AS BIGINT) AS n_base,
  CAST(sum(nm) AS BIGINT) AS n_minus,
  CAST(sum(CASE WHEN ca > 0 AND cb = 0 THEN seg ELSE 0 END) AS BIGINT)
    AS net_us
FROM sw GROUP BY k ORDER BY k"""
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
