package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Peak concurrency — per key, the maximum number of intervals open at
  * one instant, and the first instant that maximum is reached. The
  * capacity-planning readout ([[IntervalCoverage]] answers "how much time
  * was covered"; this answers "how many at once"): concurrent sessions
  * for connection-pool sizing, parallel jobs for cluster width, peak
  * occupancy for rate limits.
  *
  * Shape: the classic +1/−1 sweep. Each interval emits a `+1` event at
  * `from` and a `−1` at `to`; events sort by `(ts, delta)` so the `−1`
  * lands FIRST at equal timestamps — under `[from, to)` semantics an
  * interval ending at t and another starting at t never overlap, and
  * back-to-back sessions count as 1, not 2. A per-key running sum over
  * the event stream is the live count; its max is the peak, and
  * `max(struct(run, −ts))` elects the EARLIEST timestamp achieving it in
  * the same aggregate (run max first, then −ts max = ts min).
  *
  * Scale shape: 2 rows per interval, one per-key window (interval-
  * cardinality, spill-backed — the rank posture), one partial-agg'd
  * groupBy that reuses the window's hash partitioning. No self-join, no
  * interval cross-pairing.
  *
  * Contracts (mirrors [[IntervalCoverage]]): intervals are `[from, to)`;
  * rows with NULL endpoints or `to ≤ from` carry no occupancy and drop;
  * NULL keys keep their stratum. Timestamps are microsecond integers.
  */
object Concurrency {

  /** (keyCol, n_intervals, peak_concurrency, peak_at_us) per key.
    * `peak_at_us` is the earliest microsecond instant at which
    * `peak_concurrency` intervals are simultaneously open.
    */
  def peak(df: DataFrame, keyCol: String, fromCol: String,
           toCol: String): DataFrame = {
    val f = unix_micros(col(fromCol).cast("timestamp"))
    val t = unix_micros(col(toCol).cast("timestamp"))
    val rows = df
      .where(col(fromCol).isNotNull && col(toCol).isNotNull && t > f)
      .select(col(keyCol), f.as("__f"), t.as("__t"))
    val events = rows
      .select(col(keyCol), col("__f").as("__ts"), lit(1L).as("__d"))
      .unionAll(rows.select(col(keyCol), col("__t").as("__ts"),
        lit(-1L).as("__d")))
    // −1 before +1 at equal ts: ascending __d already orders −1 < +1
    val sweep = Window.partitionBy(col(keyCol))
      .orderBy(col("__ts"), col("__d"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("__run", sum(col("__d")).over(sweep))
      .groupBy(col(keyCol))
      .agg(
        (count(lit(1)) / 2).cast("long").as("n_intervals"),
        max(struct(col("__run"), (-col("__ts")).as("__nts"))).as("__best"))
      .select(col(keyCol), col("n_intervals"),
        col("__best.__run").as("peak_concurrency"),
        (-col("__best.__nts")).as("peak_at_us"))
  }

  /** DuckDB replay of [[peak]] — same sweep, peak elected via a second
    * window max + a filtered min (engine-idiomatic, provably the same
    * election: run max, then earliest ts among rows at the max).
    */
  def oracleSql(table: String, keyCol: String, fromCol: String,
                toCol: String): String =
    s"""WITH r AS (
  SELECT $keyCol AS k, epoch_us(CAST($fromCol AS TIMESTAMP)) AS f,
    epoch_us(CAST($toCol AS TIMESTAMP)) AS t
  FROM $table
  WHERE $fromCol IS NOT NULL AND $toCol IS NOT NULL
    AND epoch_us(CAST($toCol AS TIMESTAMP)) > epoch_us(CAST($fromCol AS TIMESTAMP))),
e AS (
  SELECT k, f AS ts, CAST(1 AS BIGINT) AS d FROM r
  UNION ALL
  SELECT k, t AS ts, CAST(-1 AS BIGINT) AS d FROM r),
w AS (
  SELECT k, ts, sum(d) OVER (PARTITION BY k ORDER BY ts, d
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
  FROM e),
m AS (SELECT k, ts, run, max(run) OVER (PARTITION BY k) AS pk FROM w)
SELECT k AS $keyCol, CAST(count(*) / 2 AS BIGINT) AS n_intervals,
  CAST(max(run) AS BIGINT) AS peak_concurrency,
  CAST(min(CASE WHEN run = pk THEN ts END) AS BIGINT) AS peak_at_us
FROM m GROUP BY k ORDER BY k""".stripMargin
}
